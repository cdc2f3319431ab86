"""Count-min sketch (operators/sketches.py): one-sided error, exact
mergeability, weighted counts, and the constant-size grid contract."""

from pyspark.sql import functions as F

from albedo_spark.operators.sketches import build_cms, cms_estimate, merge_cms

D, W = 4, 16  # small width on purpose: forces collisions so est > exact


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_cms_never_undercounts_and_grid_is_constant(spark):
    rows = [(i % 7,) for i in range(200)] + [(99,)] * 50
    df = spark.createDataFrame(rows, "k long")
    sk = build_cms(df, "k", depth=D, width=W)
    assert sk.count() == D * W  # every cell materialized, zeros included
    assert sk.agg(F.sum("cell")).first()[0] == 250 * D  # mass conservation
    est = {
        r.k: r.est
        for r in cms_estimate(
            sk, _keys_df(spark, [0, 1, 6, 99, 12345]), "k", depth=D, width=W
        ).collect()
    }
    exact = {0: 29, 1: 29, 6: 28, 99: 50, 12345: 0}
    for k, ex in exact.items():
        assert est[k] >= ex, (k, est[k], ex)


def test_cms_merge_equals_rebuild(spark):
    a = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 9,) for i in range(80)], "k long")
    merged = {
        (r.row, r.bucket): r.cell
        for r in merge_cms(
            build_cms(a, "k", depth=D, width=W), build_cms(b, "k", depth=D, width=W)
        ).collect()
    }
    rebuilt = {
        (r.row, r.bucket): r.cell
        for r in build_cms(a.unionByName(b), "k", depth=D, width=W).collect()
    }
    assert merged == rebuilt


def test_cms_weighted(spark):
    df = spark.createDataFrame([(1, 10), (1, 5), (2, 7)], "k long, w long")
    sk = build_cms(df, "k", depth=D, width=W, weight_col="w")
    est = {
        r.k: r.est
        for r in cms_estimate(sk, _keys_df(spark, [1, 2]), "k", depth=D, width=W).collect()
    }
    assert est[1] >= 15 and est[2] >= 7
    assert sk.agg(F.sum("cell")).first()[0] == 22 * D


def test_hll_merge_equals_rebuild_and_accuracy(spark):
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_hll, hll_estimate, merge_hll

    a = spark.range(0, 1200).select(F.col("id").alias("k"))
    b = spark.range(800, 2400).select(F.col("id").alias("k"))
    merged = {
        r.bucket: r.reg
        for r in merge_hll(build_hll(a, "k"), build_hll(b, "k")).collect()
    }
    rebuilt = {r.bucket: r.reg for r in build_hll(a.unionByName(b), "k").collect()}
    assert merged == rebuilt
    assert len(rebuilt) == 64  # constant register frame, zeros included

    # raw-estimator accuracy: sigma = 1.04/sqrt(64) = 13%; assert 3 sigma
    est = hll_estimate(build_hll(a.unionByName(b), "k"), m=64).first().est
    exact = 2400
    assert abs(est - exact) / exact < 0.39


def test_hll_rejects_invalid_m(spark):
    """Round-8 advisor finding: below m=64 the 60-bit hash tail exceeds
    the 2^54 rho sentinel and the estimator's shiftleft goes negative
    (silently masked mod 64 by the JVM) — so m < 64 and non-power-of-two
    m must raise instead of returning garbage. m=128 stays admissible
    (merge/estimate run and the register frame is constant-size)."""
    import pytest

    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_hll, hll_estimate

    df = spark.range(100).select(F.col("id").alias("k"))
    for bad in (16, 32, 63, 100):
        with pytest.raises(ValueError):
            build_hll(df, "k", m=bad)
        with pytest.raises(ValueError):
            hll_estimate(df.selectExpr("CAST(k % 5 AS INT) AS reg"), m=bad)
    regs = build_hll(df, "k", m=128)
    assert regs.count() == 128
    assert hll_estimate(regs, m=128).first().est > 0


def test_hll_insensitive_to_duplicates(spark):
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_hll

    once = spark.range(500).select(F.col("id").alias("k"))
    many = once.unionByName(once).unionByName(once)
    r1 = {r.bucket: r.reg for r in build_hll(once, "k").collect()}
    r3 = {r.bucket: r.reg for r in build_hll(many, "k").collect()}
    assert r1 == r3  # registers are max-of-rho: multiplicity-invariant


def test_cms_heavy_hitters_no_false_negatives_and_plan(spark):
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import cms_heavy_hitters

    # 3 hot keys among a wide tail — narrow width forces collisions, so
    # the candidate set has false positives the exact pass must remove
    rows = (
        [(1,)] * 50 + [(2,)] * 45 + [(3,)] * 40 + [(i,) for i in range(100, 500)]
    )
    df = spark.createDataFrame(rows, "k long")
    out = cms_heavy_hitters(df, "k", threshold=40, depth=D, width=W)
    got = {r.k: r.n for r in out.collect()}
    assert got == {1: 50, 2: 45, 3: 40}  # exact counts, zero misses
    # the candidate filter is map-side: only literal lookups before the agg
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_hll_by_merge_equals_rebuild_and_grid(spark):
    """Keyed registers: merge_hll_by(hll(A), hll(B)) == hll(A ∪ B) per
    group EXACTLY; every group carries its full zero-filled 64-bucket
    grid; groups present on one side only pass through the merge."""
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_hll_by, merge_hll_by

    a = spark.range(0, 900).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    b = spark.range(600, 1500).select(
        (F.col("id") % 2 + 10).cast("string").alias("g"), F.col("id").alias("k")
    )
    merged = {
        (r.g, r.bucket): r.reg
        for r in merge_hll_by(
            build_hll_by(a, "g", "k"), build_hll_by(b, "g", "k"), "g"
        ).collect()
    }
    rebuilt = {
        (r.g, r.bucket): r.reg
        for r in build_hll_by(a.unionByName(b), "g", "k").collect()
    }
    assert merged == rebuilt
    groups = {g for g, _ in rebuilt}
    assert groups == {"0", "1", "2", "10", "11"}
    for g in groups:
        assert sum(1 for gg, _ in rebuilt if gg == g) == 64


def test_hll_estimate_by_matches_global_per_group(spark):
    """The grouped estimator is the global estimator applied per group:
    for each group, hll_estimate over that group's registers alone gives
    the identical BIGINT estimate."""
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import (
        build_hll,
        build_hll_by,
        hll_estimate,
        hll_estimate_by,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 4).cast("string").alias("g"), F.col("id").alias("k")
    )
    grouped = {
        r.g: r.est for r in hll_estimate_by(build_hll_by(df, "g", "k"), "g").collect()
    }
    for g in ["0", "1", "2", "3"]:
        solo = hll_estimate(
            build_hll(df.where(F.col("g") == g), "k")
        ).first().est
        assert grouped[g] == solo


def test_histogram_merge_equals_rebuild_and_constant_size(spark):
    """hist(A) + hist(B) elementwise == hist(A ∪ B) (the positional-sum
    merge contract); the frame always has |edges|+1 buckets per group,
    zeros included, regardless of data."""
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_histogram

    edges = [10, 100, 1000]
    a = spark.range(0, 500).select((F.col("id") * 3).alias("v"))
    b = spark.range(0, 300).select((F.col("id") * 7).alias("v"))
    ha = {r.bucket: r.cnt for r in build_histogram(a, "v", edges).collect()}
    hb = {r.bucket: r.cnt for r in build_histogram(b, "v", edges).collect()}
    hu = {
        r.bucket: r.cnt
        for r in build_histogram(a.unionByName(b), "v", edges).collect()
    }
    assert set(ha) == set(hb) == set(hu) == {0, 1, 2, 3}
    for bkt in hu:
        assert ha[bkt] + hb[bkt] == hu[bkt]
    assert sum(hu.values()) == 800


def test_histogram_quantiles_bound_exact_percentile(spark):
    """The histogram quantile contract: the estimate is the upper edge
    of the bucket holding the exact rank-ceil(q·N/100) value — so the
    exact percentile is <= the estimate and > the previous edge (error
    bounded by one bucket width)."""
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_histogram, histogram_quantiles

    edges = [100, 200, 400, 800, 1600, 3200]
    df = spark.range(1, 2001).select((F.col("id")).alias("v"))  # 1..2000
    hist = build_histogram(df, "v", edges)
    got = {
        r.q_x100: r.est
        for r in histogram_quantiles(hist, edges, [50, 90, 99]).collect()
    }
    import math

    vals = list(range(1, 2001))
    for q, est in got.items():
        exact = vals[math.ceil(q * len(vals) / 100) - 1]
        assert exact <= est, (q, exact, est)
        prev = max([e for e in edges if e < est], default=0)
        assert exact > prev, (q, exact, est, prev)


def test_histogram_grouped_and_overflow_bucket(spark):
    """Grouped histograms zero-fill per group; values past the last edge
    land in the overflow bucket and quantiles estimate as the last edge
    (the documented no-upper-bound contract)."""
    from pyspark.sql import functions as F

    from albedo_spark.operators.sketches import build_histogram, histogram_quantiles

    edges = [10, 20]
    df = spark.createDataFrame(
        [("a", 5), ("a", 15), ("a", 99), ("b", 99)], "g string, v long"
    )
    hist = build_histogram(df, "v", edges, group_col="g")
    cells = {(r.g, r.bucket): r.cnt for r in hist.collect()}
    assert cells == {
        ("a", 0): 1, ("a", 1): 1, ("a", 2): 1,
        ("b", 0): 0, ("b", 1): 0, ("b", 2): 1,
    }
    qs = {
        (r.g, r.q_x100): r.est
        for r in histogram_quantiles(hist, edges, [99], group_col="g").collect()
    }
    assert qs[("b", 99)] == 20  # overflow estimates at the last edge


def test_build_histogram_null_contract(spark):
    """NULL values and NULL group keys are EXCLUDED, not folded into
    bucket 0 (ADVICE r9: the filter-size idiom bucketed NULL _v as 0 and
    the non-null-safe grid join dropped NULL-group counts)."""
    from albedo_spark.operators.sketches import build_histogram

    edges = [10, 20]
    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("a", 15), (None, 5), ("b", 25)],
        "g string, v int",
    )
    got = {
        (r.g, r.bucket): r.cnt
        for r in build_histogram(df, "v", edges, group_col="g").collect()
    }
    # NULL v and NULL g rows gone; full grid per surviving group
    assert got == {
        ("a", 0): 1, ("a", 1): 1, ("a", 2): 0,
        ("b", 0): 0, ("b", 1): 0, ("b", 2): 1,
    }
    ungrouped = {
        r.bucket: r.cnt for r in build_histogram(df, "v", edges).collect()
    }
    assert ungrouped == {0: 2, 1: 1, 2: 1}  # NULL v excluded, NULL g counted


def test_cms_heavy_hitters_probe_paths_agree(spark, monkeypatch):
    """The r15 one-row-array probe (small grids) and the per-row
    broadcast-join probe (million-cell grids) must elect IDENTICAL
    heavy hitters — the size switch is a plan choice, never a result
    choice."""
    import albedo_spark.operators.sketches as sk

    rows = (
        [(1,)] * 30 + [(2,)] * 25 + [(i,) for i in range(100, 400)]
    )
    df = spark.createDataFrame(rows, "k long")
    arr = sk.cms_heavy_hitters(df, "k", threshold=25, depth=D, width=W)
    got_arr = {r.k: r.n for r in arr.collect()}
    monkeypatch.setattr(sk, "_CMS_ARRAY_CELLS_MAX", 0)  # force join path
    join = sk.cms_heavy_hitters(df, "k", threshold=25, depth=D, width=W)
    got_join = {r.k: r.n for r in join.collect()}
    assert got_arr == got_join == {1: 30, 2: 25}
    # array path: single broadcast, no per-row join chain
    plan = arr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") <= 1
