"""Sources, sinks and memoization (SURVEY.md §2.1).

The reference pattern: full-table JDBC read → day-stamped parquet memoize
(``S/utils/DatasetUtils.scala:36-50``, day pathing ``S/settings/package.scala:12-19``),
then every downstream job loads the parquet. We keep exactly that pattern —
it is semantic (cross-job snapshot reuse), not just perf — and add the
model-memoizer twin (``S/utils/ModelUtils.scala:7-21``).

At 100 TB the memoized tables should additionally be *bucketed* by their
dominant join key so repeated joins skip the shuffle; ``write_bucketed``
provides that (saveAsTable is required for bucket metadata to survive).
"""

from __future__ import annotations

import datetime as _dt
import os
from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession


def today_path(data_dir: str, name: str, day: str | None = None) -> str:
    """``{dataDir}/{yyyyMMdd}/{name}.parquet`` (S/settings/package.scala:12-19)."""
    day = day or _dt.date.today().strftime("%Y%m%d")
    return os.path.join(data_dir, day, f"{name}.parquet")


def load_or_create_df(
    spark: SparkSession, path: str, create: Callable[[], DataFrame]
) -> DataFrame:
    """Try parquet, else compute + write + re-read
    (S/utils/DatasetUtils.scala:36-50 catches 'Path does not exist')."""
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        df = create()
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)


def load_or_create_model(model_cls, path: str, create: Callable[[], object]):
    """Model memoizer (S/utils/ModelUtils.scala:7-21)."""
    try:
        return model_cls.load(path)
    except Exception:
        model = create()
        model.write().overwrite().save(path)
        return model_cls.load(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver TESTDATA table (TESTDATA.md).

    Normalizes nanosecond-timestamp columns (read as int64 under
    ``spark.sql.legacy.parquet.nanosAsLong``) back to real timestamps.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution now
    except AnalysisException as exc:
        if "PARQUET_TYPE_ILLEGAL" not in str(exc):
            raise
        # Driver-provided sessions may lack the nanos conf; it is a runtime
        # SQL conf, so set it and retry.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # ns -> us must be INTEGER division: epoch-ns (~1.7e18) exceeds
        # double's 53-bit mantissa, so `/ 1000` in double drifts by up to
        # ~1 us — enough to split any us-exact cross-engine comparison.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict[str, str],
    partition_column: str | None = None, num_partitions: int = 32,
    lower_bound: int | None = None, upper_bound: int | None = None,
) -> DataFrame:
    """JDBC scan (S/utils/DatasetUtils.scala:57,82,116,130).

    The reference reads whole MySQL tables on one connection; at scale,
    always supply ``partition_column`` + bounds so the read parallelizes.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    return reader.load()


# Raw-DB column -> canonical name bridges (S/utils/DatasetUtils.scala:58-106:
# the reference's 24 withColumnRenamed calls after each MySQL read; one dict
# per table here, applied as a single projection instead of 24 chained
# renames so the scan stays one Project node).
USER_INFO_RENAMES = {
    "id": "user_id",
    "login": "user_login",
    "account_type": "user_account_type",
    "name": "user_name",
    "company": "user_company",
    "blog": "user_blog",
    "location": "user_location",
    "email": "user_email",
    "bio": "user_bio",
    "public_repos": "user_public_repos_count",
    "public_gists": "user_public_gists_count",
    "followers": "user_followers_count",
    "following": "user_following_count",
    "created_at": "user_created_at",
    "updated_at": "user_updated_at",
}

REPO_INFO_RENAMES = {
    "id": "repo_id",
    "owner_id": "repo_owner_id",
    "owner_username": "repo_owner_username",
    "owner_type": "repo_owner_type",
    "name": "repo_name",
    "full_name": "repo_full_name",
    "description": "repo_description",
    "language": "repo_language",
    "created_at": "repo_created_at",
    "updated_at": "repo_updated_at",
    "pushed_at": "repo_pushed_at",
    "homepage": "repo_homepage",
    "size": "repo_size",
    "stargazers_count": "repo_stargazers_count",
    "forks_count": "repo_forks_count",
    "subscribers_count": "repo_subscribers_count",
    "fork": "repo_is_fork",
    "has_issues": "repo_has_issues",
    "has_projects": "repo_has_projects",
    "has_downloads": "repo_has_downloads",
    "has_wiki": "repo_has_wiki",
    "has_pages": "repo_has_pages",
    "open_issues_count": "repo_open_issues_count",
    "topics": "repo_topics",
}


def canonicalize_columns(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """Apply a raw→canonical rename map as ONE projection (columns not in
    the map pass through untouched)."""
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(c).alias(renames.get(c, c)) for c in df.columns]
    )


def read_jdbc_canonical(
    spark: SparkSession, url: str, table: str, properties: dict[str, str],
    renames: dict[str, str], **partition_kwargs,
) -> DataFrame:
    """JDBC read + canonical renames — the reference's per-table load shape
    (S/utils/DatasetUtils.scala:52-106) as one call. Pass
    ``partition_column``/bounds so the scan parallelizes (always, at scale)."""
    return canonicalize_columns(
        read_jdbc(spark, url, table, properties, **partition_kwargs), renames
    )


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Overwrite-mode parquet sink (S/utils/DatasetUtils.scala:43)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, num_buckets: int = 256,
) -> None:
    """Bucketed managed-table sink: co-locates future joins/aggs on
    ``bucket_col`` without a shuffle. The scale-path upgrade of the
    reference's ad-hoc ``repartition($"user_id")`` calls
    (S/utils/DatasetUtils.scala:121,134)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def widen(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan currently has fewer partitions
    than the session's parallelism.

    Single small parquet files scan as ONE input split, serializing every
    downstream map stage (shingling, hashing, feature extraction) onto one
    core; a bounded repartition fixes that for pennies. On wide production
    scans (many splits) this is a no-op — no shuffle is added.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
