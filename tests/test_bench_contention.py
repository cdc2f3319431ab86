"""Unit tests for bench.py's contended-run decision function (VERDICT
r12 ask #4): the bench artifact must declare, about itself, when its
boundary calibration pair shows the host sped up or slowed down
mid-run — the class of silently-poisoned artifact round 10 produced.
Thresholds are 2x per probe (r14): the JVM probe's JIT-maturity
start-bias that forced r13's 3x widening is now removed at the source
by bench_calibration's untimed warm loop, and a live test below pins
that a warmed boundary pair really does stay tight."""

import sys

sys.path.insert(0, "/root/repo")

from bench import _CONTENTION_FACTORS, contention_flag


def test_steady_host_not_contended():
    contended, ratios = contention_flag(
        {"cpu_single": 0.35, "spark_parallel": 0.11},
        {"cpu_single": 0.36, "spark_parallel": 0.10},
    )
    assert not contended
    assert ratios["cpu_single"] == 1.029
    assert ratios["spark_parallel"] == 1.1


def test_cpu_spike_flags():
    contended, ratios = contention_flag(
        {"cpu_single": 0.35, "spark_parallel": 0.11},
        {"cpu_single": 0.80, "spark_parallel": 0.11},
    )
    assert contended
    assert ratios["cpu_single"] > 2.0


def test_parallel_probe_alone_flags():
    # Shared-host contention hits multi-core throughput first (the r6
    # observation) — the parallel probe alone must be able to flag.
    contended, _ = contention_flag(
        {"cpu_single": 0.35, "spark_parallel": 0.40},
        {"cpu_single": 0.35, "spark_parallel": 0.11},
    )
    assert contended


def test_parallel_spike_beyond_2x_flags():
    # r13's 3x threshold let a genuine 2.5x co-tenant spike hide inside
    # the JIT-maturity allowance; with the probe warmed at the source
    # the allowance is gone and 2x+ parallel movement must flag.
    contended, ratios = contention_flag(
        {"cpu_single": 0.35, "spark_parallel": 0.25},
        {"cpu_single": 0.35, "spark_parallel": 0.10},
    )
    assert contended
    assert ratios["spark_parallel"] == 2.5


def test_direction_symmetric():
    # A host that STARTED contended and recovered is just as poisoned.
    fast_then_slow, _ = contention_flag(
        {"cpu_single": 0.35}, {"cpu_single": 0.90}
    )
    slow_then_fast, _ = contention_flag(
        {"cpu_single": 0.90}, {"cpu_single": 0.35}
    )
    assert fast_then_slow and slow_then_fast


def test_missing_probes_are_not_evidence():
    # Calibration can fail (it is try/except-ed in main): absence of a
    # probe on either side must not flag, and no ratio is recorded.
    contended, ratios = contention_flag({}, {"cpu_single": 0.35})
    assert not contended and ratios == {}
    contended, ratios = contention_flag(
        {"cpu_single": 0.35, "spark_parallel": 0.11}, {"cpu_single": 0.36}
    )
    assert not contended
    assert list(ratios) == ["cpu_single"]


def test_exactly_at_factor_passes():
    contended, _ = contention_flag(
        {"cpu_single": 0.35}, {"cpu_single": 0.70}
    )
    assert not contended  # strict >, boundary is benign


def test_default_factors_shape():
    assert _CONTENTION_FACTORS == {"cpu_single": 2.0, "spark_parallel": 2.0}


def test_warmed_boundary_pair_stays_tight(spark):
    # The live pin behind the 2x threshold (VERDICT r13 #2): with the
    # untimed warm loop inside bench_calibration, two back-to-back
    # calibrations must agree closely — the systematic ~2.5x start-bias
    # the un-warmed probe showed would fail this immediately. 1.5 is
    # deliberately looser than the ~1.3 an idle box attains, so only a
    # real warm-state regression (or a genuinely contended test box)
    # trips it, and far tighter than the old 3x allowance.
    from bench import bench_calibration

    a = bench_calibration(spark)
    b = bench_calibration(spark)
    ratio = max(a["spark_parallel"], b["spark_parallel"]) / min(
        a["spark_parallel"], b["spark_parallel"]
    )
    assert ratio < 1.5, (a, b)
