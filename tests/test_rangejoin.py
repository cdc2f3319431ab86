"""Bucketed range join == naive range join, and the plan is an equi-join."""

import datetime as dt

from pyspark.sql import functions as F

from albedo_spark.operators.rangejoin import time_range_join


def _df(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = [(u, i, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(
        [(1, 0), (1, 500), (1, 1200), (2, 100), (3, 50)]
    )]
    right = [(u, 100 + i, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(
        [(1, -300), (1, 10), (1, 450), (1, 1100), (2, 95), (2, 800), (9, 0)]
    )]
    ldf = spark.createDataFrame(left, "u int, lid int, lts timestamp")
    rdf = spark.createDataFrame(right, "u int, rid int, rts timestamp")
    return ldf, rdf


def test_matches_naive_range_join(spark):
    ldf, rdf = _df(spark)
    bucketed = sorted(
        (r.lid, r.rid)
        for r in time_range_join(ldf, rdf, ["u"], "lts", "rts", -600, 0).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in ldf.join(
            rdf,
            (ldf.u == rdf.u)
            & (F.unix_timestamp(rdf.rts) >= F.unix_timestamp(ldf.lts) - 600)
            & (F.unix_timestamp(rdf.rts) <= F.unix_timestamp(ldf.lts)),
        ).collect()
    )
    assert bucketed == naive and len(bucketed) > 0


def test_plan_is_equi_join_not_nested_loop(spark):
    ldf, rdf = _df(spark)
    plan = (
        time_range_join(ldf, rdf, ["u"], "lts", "rts", -600, 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_subsecond_bounds_are_exact(spark):
    """The window predicate honors microseconds: a right row 600.1 s before
    the left row is OUTSIDE a [-600, 0] window even though whole-second
    truncation (the old unix_timestamp form) would have accepted it."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0, 500_000)
    ldf = spark.createDataFrame([(1, 1, base)], "u int, lid int, lts timestamp")
    rdf = spark.createDataFrame(
        [
            (1, 100, base - dt.timedelta(seconds=600, milliseconds=100)),  # out
            (1, 101, base - dt.timedelta(seconds=599, milliseconds=900)),  # in
            (1, 102, base - dt.timedelta(seconds=600)),                    # boundary: in
            (1, 103, base + dt.timedelta(microseconds=1)),                 # out (future)
            (1, 104, base),                                                # boundary: in
        ],
        "u int, rid int, rts timestamp",
    )
    got = sorted(
        r.rid
        for r in time_range_join(ldf, rdf, ["u"], "lts", "rts", -600, 0).collect()
    )
    assert got == [101, 102, 104]
