"""Unit tests for bench.py's contended-run decision function (VERDICT
r12 ask #4): the bench artifact must declare, about itself, when its
boundary calibration pair shows the host sped up or slowed down
mid-run — the class of silently-poisoned artifact round 10 produced.
Thresholds are per-probe: 2x for the pure-Python cpu_single probe, 3x
for the JVM parallel probe (which carries an inherent start-vs-end
JIT-maturity bias of up to ~1.5-2x — measured r13)."""

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


def test_jit_maturity_band_does_not_flag():
    # A fresh-JVM start probe attaining ~1.5-2x the mature end value is
    # measured engine warm-state, not host contention: under the 3x
    # parallel threshold this must stay quiet.
    contended, ratios = contention_flag(
        {"cpu_single": 0.35, "spark_parallel": 0.20},
        {"cpu_single": 0.35, "spark_parallel": 0.10},
    )
    assert not contended
    assert ratios["spark_parallel"] == 2.0


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
    assert _CONTENTION_FACTORS == {"cpu_single": 2.0, "spark_parallel": 3.0}
