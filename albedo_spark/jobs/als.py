"""ALS recommender job: implicit-feedback matrix factorization on the
starring table, reference params by default (rank 50, reg 0.5, alpha 40,
26 iters, seed 42 — ``S/ALSRecommenderBuilder.scala:46-58``); --fast uses a
small rank/iters config for fixtures/smoke runs."""

from __future__ import annotations

import sys

from albedo_spark.jobs import common
from albedo_spark.recommenders import ALSRecommender
from albedo_spark.recommenders.als import train_als


def main(argv: list[str] | None = None) -> float:
    parser = common.build_parser(__doc__)
    parser.add_argument("--fast", action="store_true",
                        help="rank=8/maxIter=5 smoke config")
    parser.add_argument(
        "--checkpoint-dir", default="/tmp/albedo_spark/als_checkpoints",
        help="ALS factor-lineage checkpoint dir (S12, "
        "ALSRecommenderBuilder.scala:36); pass '' to disable",
    )
    args = parser.parse_args(argv)
    spark = common.get_session(args, "als")
    tables = common.load_tables(spark, args)
    overrides = dict(rank=8, maxIter=5) if args.fast else {}
    model = train_als(
        tables["starring"],
        checkpoint_dir=args.checkpoint_dir or None,
        **overrides,
    )
    test_users = common.sample_test_users(tables["starring"], args.eval_sample)
    rec = ALSRecommender(als_model=model, topK=args.top_k)
    return common.run_and_report(
        "als", rec.transform(test_users), tables, test_users, args.top_k
    )


if __name__ == "__main__":
    main(sys.argv[1:])
