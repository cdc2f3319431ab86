"""Profile-builder job (E1): user + repo feature tables
(``S/UserProfileBuilder.scala`` / ``S/RepoProfileBuilder.scala``,
Makefile:92-118). Writes parquet under --out if given, else just reports
row counts and the pinned user's profile row."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from albedo_spark.fixtures import FIXED_USER_ID
from albedo_spark.jobs import common
from albedo_spark.pipelines import build_repo_profile, build_user_profile


def main(argv: list[str] | None = None) -> tuple[int, int]:
    parser = common.build_parser(__doc__)
    parser.add_argument("--out", help="write user_profile/repo_profile parquet here")
    args = parser.parse_args(argv)
    spark = common.get_session(args, "profiles")
    tables = common.load_tables(spark, args)
    up = build_user_profile(
        tables["user_info"], tables["repo_info"], tables["starring"]
    ).cache()
    rp = build_repo_profile(tables["repo_info"], tables["starring"]).cache()
    n_up, n_rp = up.count(), rp.count()
    print(f"user_profile rows = {n_up}; repo_profile rows = {n_rp}")
    up.where(F.col("user_id") == FIXED_USER_ID).show(1, vertical=True, truncate=60)
    if args.out:
        up.write.mode("overwrite").parquet(f"{args.out}/user_profile")
        rp.write.mode("overwrite").parquet(f"{args.out}/repo_profile")
    return n_up, n_rp


if __name__ == "__main__":
    main(sys.argv[1:])
