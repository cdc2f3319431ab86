"""MERGE emulation semantics: partition-pruned upsert and SCD2 folding
(operators/merge.py)."""

import datetime as dt

from pyspark.sql import functions as F

from albedo_spark.operators.merge import scd2_apply, upsert_partitioned


def _rows(spark, rows):
    return spark.createDataFrame(rows, "day string, id long, v double")


def test_upsert_touches_only_update_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _rows(
        spark,
        [("d1", 1, 1.0), ("d1", 2, 2.0), ("d2", 3, 3.0), ("d3", 4, 4.0)],
    )
    upsert_partitioned(spark, base, path, ["id"], ["day"])

    batch = _rows(spark, [("d1", 2, 20.0), ("d1", 9, 9.0)])  # update + insert
    upsert_partitioned(spark, batch, path, ["id"], ["day"])

    got = {(str(r.day), r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        ("d1", 1, 1.0),
        ("d1", 2, 20.0),   # updated
        ("d1", 9, 9.0),    # inserted
        ("d2", 3, 3.0),    # untouched partition
        ("d3", 4, 4.0),
    }
    # idempotent: rerunning the batch converges
    upsert_partitioned(spark, batch, path, ["id"], ["day"])
    assert {(str(r.day), r.id, r.v) for r in spark.read.parquet(path).collect()} == got


def test_upsert_non_enoent_failure_raises_not_truncates(spark, tmp_path):
    """A target-read failure that is NOT path-not-found must propagate.

    Regression for the bare-except hazard: swallowing e.g. a schema-drift
    AnalysisException as 'first write' would rewrite the touched
    partitions with the update batch alone, destroying existing rows."""
    import pytest
    from pyspark.errors import AnalysisException

    path = str(tmp_path / "t")
    base = _rows(spark, [("d1", 1, 1.0), ("d1", 2, 2.0)])
    upsert_partitioned(spark, base, path, ["id"], ["day"])

    # Partition column mismatch: target exists, but the pruning predicate
    # references a column the target lacks -> UNRESOLVED_COLUMN, not ENOENT.
    drifted = spark.createDataFrame([("x", 2, 20.0)], "shard string, id long, v double")
    with pytest.raises(AnalysisException):
        upsert_partitioned(spark, drifted, path, ["id"], ["shard"])

    # Target untouched: the failed merge wrote nothing.
    got = {(str(r.day), r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("d1", 1, 1.0), ("d1", 2, 2.0)}


def test_scd2_fold(spark):
    ts = dt.datetime(2024, 1, 1)
    ts2 = dt.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [
            # key 1: one closed + one live version
            (1, "a_old", dt.datetime(2023, 1, 1), ts),
            (1, "a", ts, None),
            (2, "b", ts, None),
            (3, "c", ts, None),
        ],
        "id long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", ts2),   # changed -> close + open
            (2, "b", ts2),    # identical -> dropped
            (9, "new", ts2),  # new key -> insert
        ],
        "id long, attr string, effective_ts timestamp",
    )
    out = scd2_apply(current, changes, ["id"])
    got = {
        (r.id, r.attr, r.valid_from, r.valid_to) for r in out.collect()
    }
    assert got == {
        (1, "a_old", dt.datetime(2023, 1, 1), ts),   # history untouched
        (1, "a", ts, ts2),                           # closed now
        (1, "a2", ts2, None),                        # new live version
        (2, "b", ts, None),                          # identical change dropped
        (3, "c", ts, None),                          # untouched key
        (9, "new", ts2, None),                       # brand-new key
    }
    # exactly one live row per present key
    live = out.where(F.col("valid_to").isNull())
    assert live.groupBy("id").count().agg(F.max("count")).collect()[0][0] == 1


def test_snapshot_diff(spark):
    from albedo_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, None, 4.0), (5, "e", 5.0)],
        "id long, s string, v double",
    )
    got = {r.id: r.change_type for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 4 null-safe unchanged, 5 added
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_transitions(spark):
    from albedo_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, s string")
    new = spark.createDataFrame([(1, "x")], "id long, s string")
    got = snapshot_diff(old, new, ["id"]).collect()
    assert [(r.id, r.change_type) for r in got] == [(1, "changed")]
