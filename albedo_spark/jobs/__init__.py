"""CLI job entry points mirroring the reference's spark-submit builders
(``S/PopularityRecommenderBuilder.scala`` etc., Makefile:92-213):

    python -m albedo_spark.jobs.popularity [--data-dir DIR] [--top-k 30]
    python -m albedo_spark.jobs.curation   ...
    python -m albedo_spark.jobs.als        ...
    python -m albedo_spark.jobs.content    ...

Each job loads the albedo-shaped tables (parquet under --data-dir, or the
seeded synthetic fixtures when omitted), fits/applies its recommender,
prints NDCG@k over a sampled user set (the reference's evaluation
protocol: actuals from the FULL starring table, SURVEY §1.4 #3) and the
top-k table for the pinned spot-check user 652070
(``S/PopularityRecommenderBuilder.scala:56-79`` output shape)."""
