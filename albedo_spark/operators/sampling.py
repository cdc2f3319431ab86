"""Sampling and split operators (SURVEY.md §2.8).

The reference mixes DF randomSplit (R1), stratified ``sampleBy`` (R2,
``S/utils/DatasetUtils.scala:21-28``) and an RDD ``subtract`` for the
complement (J6). Here the complement is a broadcast-friendly ``left_anti``
on the key — no RDDs, no full-row comparison shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_split(
    df: DataFrame,
    strat_col: str,
    fraction: float,
    key_cols: list[str],
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(sample, complement) stratified by ``strat_col``.

    Fractions are uniform per stratum (the reference builds an explicit
    per-user fraction map from collected ids — equivalent, but that collect
    is a driver bottleneck at scale; ``sampleBy`` accepts the map form too).
    Complement = left_anti on ``key_cols`` (replaces RDD subtract, J6).
    """
    strata = [r[0] for r in df.select(strat_col).distinct().collect()]
    fractions = {s: fraction for s in strata}
    sample = df.sampleBy(strat_col, fractions, seed)
    complement = df.join(sample.select(*key_cols), key_cols, "left_anti")
    return sample, complement


def random_split(df: DataFrame, weights: list[float], seed: int = 42) -> list[DataFrame]:
    """R1 (``randomSplit(Array(0.9, 0.1))`` in every builder)."""
    return df.randomSplit(weights, seed)


def deterministic_sample(df: DataFrame, key_col: str, mod: int, keep: int = 0) -> DataFrame:
    """Hash-based deterministic sample: keep rows where
    ``pmod(xxhash64(key), mod) == keep``. Reproducible across runs/engines
    with the same key — the scale-safe alternative to seeded Bernoulli
    sampling when the oracle must agree row-for-row."""
    return df.where(F.pmod(F.xxhash64(F.col(key_col)), F.lit(mod)) == F.lit(keep))
