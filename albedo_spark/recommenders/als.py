"""ALSRecommender (M3).

Reference: ``S/recommenders/ALSRecommender.scala:28-66`` hand-rolls factor
top-k: blockified crossJoin of user×item factors, per-pair BLAS sdot, and a
copied-from-Spark ``BoundedPriorityQueue`` heap (O4). All of that is
superseded by ``ALSModel.recommendForUserSubset`` (built-in since Spark 2.3
— itself blocked + BLAS internally, SURVEY.md J4 note) followed by one
``explode``; this file is deliberately ~20 lines of plan, not 120 of
execution machinery.

Training params (reference: ``S/ALSRecommenderBuilder.scala:46-58``):
implicitPrefs=True, rank=50, regParam=0.5, alpha=40, maxIter=26, seed=42,
coldStartStrategy='drop'.
"""

from __future__ import annotations

from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.recommenders.base import Recommender

REFERENCE_ALS_PARAMS = dict(
    implicitPrefs=True,
    rank=50,
    regParam=0.5,
    alpha=40.0,
    maxIter=26,
    seed=42,
    coldStartStrategy="drop",
    userCol="user_id",
    itemCol="repo_id",
    ratingCol="starring",
)


def train_als(
    starring_df: DataFrame,
    checkpoint_dir: str | None = None,
    **overrides,
) -> ALSModel:
    """Fit the reference-configured implicit ALS on the starring matrix.

    ``checkpoint_dir`` (S12, ``S/ALSRecommenderBuilder.scala:36``) truncates
    the factor lineage every ``checkpointInterval`` iterations — at the
    reference's maxIter=26 the unchecked lineage grows one stage pair per
    iteration and the DAG replays from the raw ratings on any executor
    loss; with a checkpoint dir, recovery restarts from the last
    materialized factors instead. Set it for any real iteration count."""
    params = {**REFERENCE_ALS_PARAMS, **overrides}
    if checkpoint_dir is not None:
        starring_df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return ALS(**params).fit(starring_df)


def serve_topk(
    user_factors: DataFrame,
    item_factors: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "repo_id",
) -> DataFrame:
    """Factor-serving top-k as a pure DataFrame plan — the SERVING half of
    the reference's hand-rolled recommender
    (``S/recommenders/ALSRecommender.scala:28-66``: blockified
    user×item crossJoin, per-pair BLAS sdot, BoundedPriorityQueue top-k),
    decoupled from training so it is exactly oracle-able: on integer
    factors every score is an order-independent integer dot product.

    Inputs: ``user_factors(user_col, features array<long>)`` and
    ``item_factors(item_col, features array<long>)``. Plan: broadcast the
    item-factor frame (the model side is small relative to the user base —
    at crawl scale the reference streams user blocks against the full item
    factor block the same way), ONE broadcast nested-loop cross, the dot
    product folded JVM-side (``zip_with`` + ``aggregate`` over plain column
    references — no computed-array HOF capture), then the q5 row_number
    idiom with full (score desc, item asc) tie-break. One shuffle total
    (the per-user window), no driver collect."""
    uf = user_factors.select(user_col, F.col("features").alias("_uf"))
    itf = item_factors.select(item_col, F.col("features").alias("_if"))
    dot = F.aggregate(
        F.zip_with("_uf", "_if", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = uf.crossJoin(F.broadcast(itf)).select(
        user_col, item_col, dot.alias("score")
    )
    from albedo_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        scored,
        [user_col],
        [F.col("score").desc(), F.col(item_col).asc()],
        k,
        rank_col="rank",
        keep_rank=True,
    ).select(user_col, item_col, "score", "rank")


class ALSRecommender(Recommender):
    def __init__(self, als_model: ALSModel | None = None, **kwargs):
        super().__init__(**kwargs)
        self.als_model = als_model

    source = "als"

    def recommend_for_users(self, user_df: DataFrame) -> DataFrame:
        user_col = self.getUserCol()
        recs = self.als_model.recommendForUserSubset(
            user_df.select(user_col), self.getTopK()
        )
        return recs.select(
            F.col(user_col),
            F.explode("recommendations").alias("rec"),
        ).select(
            F.col(user_col),
            F.col("rec.repo_id").alias(self.getItemCol()),
            F.col("rec.rating").cast("double").alias(self.getScoreCol()),
            F.lit(self.source).alias(self.getSourceCol()),
        )
