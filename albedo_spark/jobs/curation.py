"""Curation recommender job: repos recently starred by the five curator
accounts, recommended to everyone (``S/CurationRecommenderBuilder.scala``)."""

from __future__ import annotations

import sys

from albedo_spark.jobs import common
from albedo_spark.recommenders import CurationRecommender


def main(argv: list[str] | None = None) -> float:
    args = common.build_parser(__doc__).parse_args(argv)
    spark = common.get_session(args, "curation")
    tables = common.load_tables(spark, args)
    test_users = common.sample_test_users(tables["starring"], args.eval_sample)
    rec = CurationRecommender(starring_df=tables["starring"], topK=args.top_k)
    return common.run_and_report(
        "curation", rec.transform(test_users), tables, test_users, args.top_k
    )


if __name__ == "__main__":
    main(sys.argv[1:])
