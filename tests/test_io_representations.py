"""Representation-proofing for ``load_table`` (VERDICT r3 ask #2).

The driver's TESTDATA has shipped ``events.ts`` under two physical parquet
representations so far (int64 epoch-nanos in rounds 1-2, timestamp[us]
without a UTC flag — TIMESTAMP_NTZ to Spark >= 3.4 — in round 3).  This
suite writes the SAME logical rows under three representations (ns-int64,
us-NTZ, us-UTC) and asserts ``load_table`` yields an identical TIMESTAMP
column and identical query output over all three.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from albedo_spark.io import load_table

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0, 123456), 10, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 0, 59, 999999), 10, "view", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 1, 0, 5, 30, 1), 11, "click", 0.5, "{}"),
    (4, dt.datetime(2024, 3, 15, 23, 59, 59, 500000), 12, "buy", 9.0, "{}"),
]


def _arrays(ts_type):
    utc = dt.timezone.utc
    if pa.types.is_int64(ts_type):
        ts = pa.array(
            [int(r[1].replace(tzinfo=utc).timestamp() * 1_000_000) * 1000 for r in ROWS],
            type=pa.int64(),
        )
    else:
        ts = pa.array([r[1] for r in ROWS], type=ts_type)
    return {
        "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts": ts,
        "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in ROWS], pa.string()),
        "value": pa.array([r[4] for r in ROWS], pa.float64()),
        "props": pa.array([r[5] for r in ROWS], pa.string()),
    }


REPRESENTATIONS = {
    # round-3 representation: micros, no tz flag -> Spark TIMESTAMP_NTZ
    "us_ntz": pa.timestamp("us"),
    # plain instant micros with UTC flag -> Spark TIMESTAMP
    "us_utc": pa.timestamp("us", tz="UTC"),
    # rounds 1-2 representation: ns; Spark reads as int64 via nanosAsLong
    "ns_long": pa.timestamp("ns"),
}


@pytest.fixture(scope="module")
def rep_dirs(tmp_path_factory):
    dirs = {}
    for name, ts_type in REPRESENTATIONS.items():
        d = tmp_path_factory.mktemp(f"rep_{name}")
        cols = _arrays(ts_type if name != "ns_long" else pa.timestamp("ns"))
        table = pa.table(cols)
        pq.write_table(table, str(d / "events.parquet"))
        dirs[name] = str(d)
    return dirs


def _collect(spark, sf_dir):
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    assert str(df.schema["ts"].dataType) == "TimestampType()", (
        f"{sf_dir}: contract violated, got {df.schema['ts'].dataType}"
    )
    out = (
        df.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    return [(r.event_id, r.us) for r in out]


def test_all_representations_identical(spark, rep_dirs):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    results = {name: _collect(spark, d) for name, d in rep_dirs.items()}
    base = results["us_utc"]
    assert len(base) == len(ROWS)
    for name, got in results.items():
        assert got == base, f"representation {name} diverges from us_utc"


def test_windowed_agg_runs_on_every_representation(spark, rep_dirs):
    """The exact expression shapes that hard-errored in round 3
    (window(ts, ...), CAST(window.start AS BIGINT)) must analyze and agree
    across representations."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    outs = {}
    for name, d in rep_dirs.items():
        df = load_table(spark, d, "events")
        agg = (
            df.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .select(
                F.col("w.start").cast("long").alias("ws"),
                "n",
                F.round("sv", 6).alias("sv"),
            )
            .orderBy("ws")
        )
        outs[name] = [tuple(r) for r in agg.collect()]
    base = outs["us_utc"]
    assert len(base) == 2  # Jan-1 00:xx hour (3 events) + Mar-15 23:xx hour
    for name, got in outs.items():
        assert got == base, f"windowed agg diverges for {name}"


def test_contract_raises_on_unconvertible(spark, tmp_path):
    """A representation load_table can't normalize must raise loudly, not
    flow a wrong type downstream."""
    table = pa.table({"ts": pa.array(["2024-01-01"], pa.string())})
    d = tmp_path / "bad"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    with pytest.raises(TypeError, match="schema contract"):
        load_table(spark, str(d), "events")


def test_align_to_schema(spark):
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from albedo_spark.io import align_to_schema

    target = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ])
    drifted = spark.createDataFrame(
        [(1, "a", "web")], "ID int, name string, source string"
    )  # case drift + int->long + missing score + extra source
    aligned, report = align_to_schema(drifted, target)
    assert report == {"extra": ["source"], "missing": ["score"],
                      "retyped": ["id"]}  # reported under TARGET names
    assert aligned.schema == target
    row = aligned.collect()[0]
    assert (row.id, row.name, row.score) == (1, "a", None)

    import pytest
    with pytest.raises(ValueError, match="unexpected"):
        align_to_schema(drifted, target, on_extra="error")
    with pytest.raises(ValueError, match="missing"):
        align_to_schema(drifted, target, on_missing="error")
    with pytest.raises(ValueError, match="type drift"):
        align_to_schema(drifted, target, on_type="error")
