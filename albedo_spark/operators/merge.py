"""MERGE-style maintenance without a table format (Delta/Iceberg jars are
not in this image): partition-pruned upsert and SCD2 dimension history as
plain DataFrame compositions over parquet.

At 100 TB the key property is that an upsert touches only the PARTITIONS
present in the update batch — read those, merge, and rewrite them with
dynamic partition overwrite (``io.write_partitioned_overwrite``); every
other partition's bytes are never read or written. A table format buys
row-level deletes and snapshot isolation on top; the plan shape below is
the same one its MERGE compiles to.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from albedo_spark.io import write_partitioned_overwrite


def upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """UPSERT (update matched keys, insert new ones) into a partitioned
    parquet dataset, rewriting only the partitions the update batch
    touches.

    The touched-partition list is collected driver-side — bounded by the
    number of distinct partitions in ONE batch (days/hours, not rows) —
    and pushed down as a partition-pruning filter on the target scan.
    Matched old rows are dropped via left-anti on the key, then the
    update batch is unioned in and the touched partitions are rewritten
    in dynamic overwrite mode. Rerunning the same batch converges (the
    anti-join drops the previously-written versions).
    """
    touched = updates.select(*partition_cols).distinct().collect()
    if not touched:
        return
    pred = functools.reduce(
        operator.or_,
        [
            functools.reduce(
                operator.and_,
                [F.col(c) == F.lit(row[c]) for c in partition_cols],
            )
            for row in touched
        ],
    )
    try:
        target = spark.read.parquet(path).where(pred)
    except AnalysisException as e:
        # First write only: the target path genuinely does not exist yet.
        # Anything else (permissions, corrupt footer, schema failure,
        # transient FS error) must PROPAGATE — falling through to
        # `merged = updates` would dynamic-overwrite the touched
        # partitions with the batch alone, silently dropping every
        # pre-existing unmatched row in them.
        if not _is_path_not_found(e):
            raise
        merged = updates
    else:
        keep = target.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(updates.select(*target.columns))
    write_partitioned_overwrite(merged, path, partition_cols)


def _is_path_not_found(e: AnalysisException) -> bool:
    """True iff the AnalysisException is the missing-root-path case."""
    cls = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: None))() or ""
    if cls == "PATH_NOT_FOUND":
        return True
    # older message-only surface (mirrors io.load_or_create_df)
    return "Path does not exist" in str(e)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    effective_ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: fold a change batch into a
    versioned dimension table.

    ``current`` carries (keys, attributes, valid_from, valid_to) with
    ``valid_to IS NULL`` marking the live version; ``changes`` carries
    (keys, attributes, effective_ts). Per key:

    - attribute-identical change → dropped (no spurious version),
    - changed attributes → live version closed at ``effective_ts``, new
      version opened from it,
    - brand-new key → opened from ``effective_ts``,
    - historical (already-closed) versions pass through untouched.

    One key-partitioned join; at scale both sides shuffle once on the
    key, and the dimension (small relative to facts) is the natural
    broadcast side of downstream joins. If several changes for one key
    arrive in one batch, keep only the latest beforehand (window on
    ``effective_ts``) — this fold applies ONE version step per key.
    """
    attr_cols = [
        c
        for c in current.columns
        if c not in set(key_cols) | {valid_from, valid_to}
    ]
    live = current.where(F.col(valid_to).isNull())
    closed_history = current.where(F.col(valid_to).isNotNull())

    ch = changes.select(
        *key_cols,
        *[F.col(c).alias(f"_new_{c}") for c in attr_cols],
        F.col(effective_ts_col).alias("_eff"),
    )
    j = live.join(ch, key_cols, "full_outer")

    differs = functools.reduce(
        operator.or_,
        [
            ~(
                F.col(c).eqNullSafe(F.col(f"_new_{c}"))
            )
            for c in attr_cols
        ],
    )
    is_update = F.col("_eff").isNotNull() & F.col(valid_from).isNotNull() & differs
    is_insert = F.col("_eff").isNotNull() & F.col(valid_from).isNull()

    # surviving live rows: unmatched, or matched-but-identical (change dropped)
    unchanged = j.where(F.col("_eff").isNull() | (~differs & ~is_insert)).select(
        *key_cols, *attr_cols, valid_from, F.lit(None).cast("timestamp").alias(valid_to)
    )
    closed_now = j.where(is_update).select(
        *key_cols, *attr_cols, valid_from, F.col("_eff").alias(valid_to)
    )
    opened = j.where(is_update | is_insert).select(
        *key_cols,
        *[F.col(f"_new_{c}").alias(c) for c in attr_cols],
        F.col("_eff").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    )
    return (
        closed_history.select(*key_cols, *attr_cols, valid_from, valid_to)
        .unionByName(unchanged)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per key
    that ADDED, REMOVED, or CHANGED (any non-key column differs,
    null-safe). Unchanged keys drop out — the diff is the (usually tiny)
    delta, not the table.

    One full-outer equi-join on the key — both sides shuffle once; at
    scale the diff feeds `upsert_partitioned`/SCD2 as the change batch,
    completing the CDC loop without a table format. Output: key columns +
    ``change_type``.
    """
    import functools as _ft
    import operator as _op

    attr_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in attr_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in attr_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    differs = (
        _ft.reduce(
            _op.or_,
            [
                ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
                for c in attr_cols
            ],
        )
        if attr_cols
        else F.lit(False)
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
