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

    CARDINALITY BOUND: this collects the distinct strata to the driver and
    ships the fraction map back out with the task — fine for low-cardinality
    strata (languages, segments, labels: up to ~10^5 keys), a driver
    bottleneck for per-user stratification at 100× users. For
    high-cardinality strata use ``hash_stratified_split``, which needs no
    driver-side key list.
    """
    strata = [r[0] for r in df.select(strat_col).distinct().collect()]
    fractions = {s: fraction for s in strata}
    sample = df.sampleBy(strat_col, fractions, seed)
    complement = df.join(sample.select(*key_cols), key_cols, "left_anti")
    return sample, complement


def hash_stratified_split(
    df: DataFrame,
    strat_col: str,
    fraction: float,
    key_cols: list[str],
    seed: int = 42,
    resolution: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """(sample, complement) with ~``fraction`` of each stratum's rows, with
    NO driver-side strata collect — the scale path for high-cardinality
    strata (e.g. per-user stratification at 10^8 users).

    Each row draws a deterministic pseudo-uniform value from
    ``xxhash64(strat, *key_cols, seed)`` (``key_cols`` must identify a row
    within its stratum); rows below the fraction threshold are sampled.
    Because the hash mixes the stratum key, draws decorrelate within and
    across strata (same per-row Bernoulli guarantee as ``sampleBy``, minus
    the fraction map). Content-keyed, so the split is reproducible across
    runs and repartitionings. The complement is the exact row-level
    negation of the same pure expression — no join, no second shuffle,
    both halves are plain filters over one scan.
    """
    u = F.pmod(
        F.xxhash64(F.col(strat_col), *[F.col(c) for c in key_cols], F.lit(seed)),
        F.lit(resolution),
    )
    keep = u < int(fraction * resolution)
    return df.where(keep), df.where(~keep)


def random_split(df: DataFrame, weights: list[float], seed: int = 42) -> list[DataFrame]:
    """R1 (``randomSplit(Array(0.9, 0.1))`` in every builder)."""
    return df.randomSplit(weights, seed)


def deterministic_sample(df: DataFrame, key_col: str, mod: int, keep: int = 0) -> DataFrame:
    """Hash-based deterministic sample: keep rows where
    ``pmod(xxhash64(key), mod) == keep``.

    Reproducible across runs and repartitionings WITHIN Spark — the
    scale-safe alternative to seeded Bernoulli sampling. NOT portable across
    engines: xxhash64 with Spark's seeding exists only in Spark (DuckDB has
    no equivalent), which is why the catalog's cross-engine sample (q31,
    ``queries.py``) keys on ``md5`` instead. Use the md5 form whenever an
    external oracle must replay the same rows.
    """
    return df.where(F.pmod(F.xxhash64(F.col(key_col)), F.lit(mod)) == F.lit(keep))
