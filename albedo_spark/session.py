"""SparkSession factory.

Reference equivalent: ``S/UserProfileBuilder.scala:27-31`` (plain
``SparkSession.builder.getOrCreate``) plus the Makefile-level conf
(Kryo, executor sizing — ``Makefile:99,122``). Here the tuning knobs that
matter at 100 TB are set *in code* so every entry point gets them:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast conversion — replaces the reference's scattered manual
  ``repartition`` calls (``S/utils/DatasetUtils.scala:121,134``).
- Arrow on: every pandas UDF / toPandas crosses the Python boundary in
  columnar batches.
- Shuffle partition count is a *default*; AQE coalesces down, and on a real
  cluster you'd raise it to ~2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "albedo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On the test rig this is ``local[32]``; on a cluster, leave ``master``
    unset and let spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TESTDATA events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type, so read the raw int64 and let the loader rebuild a
        # (µs-precision) timestamp — the data is µs-grained, so lossless.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
