"""Popularity recommender job — the SURVEY §7.6 minimum slice: load →
popularRepoDF → cross-join test users → native score expr → top-k →
NDCG@30 + pinned-user table (``S/PopularityRecommenderBuilder.scala``)."""

from __future__ import annotations

import sys

from albedo_spark.jobs import common
from albedo_spark.recommenders import PopularityRecommender
from albedo_spark.recommenders.popularity import build_popular_repo_df


def main(argv: list[str] | None = None) -> float:
    args = common.build_parser(__doc__).parse_args(argv)
    spark = common.get_session(args, "popularity")
    tables = common.load_tables(spark, args)
    test_users = common.sample_test_users(tables["starring"], args.eval_sample)
    rec = PopularityRecommender(
        popular_repo_df=build_popular_repo_df(tables["repo_info"]), topK=args.top_k
    )
    return common.run_and_report(
        "popularity", rec.transform(test_users), tables, test_users, args.top_k
    )


if __name__ == "__main__":
    main(sys.argv[1:])
