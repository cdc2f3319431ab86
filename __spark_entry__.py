"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries`` exposes the full
oracle-checked catalog (albedo_spark/queries.py); ``oracle_sql`` the matching
DuckDB SQL. See SURVEY.md §2 for the operator inventory each query covers.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from albedo_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-way join + revenue rollup
    (broadcast dims, single shuffle) — see q2 in albedo_spark/queries.py."""
    return QUERIES["q2_market_segment_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
