"""Content recommender job: per-user recent-k starred repos → TF-IDF
query terms → inverted-index similarity scoring → top-k, the Spark-native
rewrite of the reference's executor-side Elasticsearch more-like-this
calls (``S/ContentRecommenderBuilder.scala``, SURVEY §7.4)."""

from __future__ import annotations

import sys

from albedo_spark.jobs import common
from albedo_spark.recommenders import ContentRecommender


def main(argv: list[str] | None = None) -> float:
    args = common.build_parser(__doc__).parse_args(argv)
    spark = common.get_session(args, "content")
    tables = common.load_tables(spark, args)
    test_users = common.sample_test_users(tables["starring"], args.eval_sample)
    rec = ContentRecommender(
        starring_df=tables["starring"],
        repo_text_df=common.repo_text(tables["repo_info"]),
        topK=args.top_k,
    )
    return common.run_and_report(
        "content", rec.transform(test_users), tables, test_users, args.top_k
    )


if __name__ == "__main__":
    main(sys.argv[1:])
