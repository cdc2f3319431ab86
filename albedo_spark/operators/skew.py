"""Skew mitigation: salted two-phase aggregation and salted replicated
joins.

Not in the reference (its datasets are small enough to repartition by
user_id, ``S/utils/DatasetUtils.scala:121,134``); at 100 TB a handful of
heavy-hitter keys (one viral repo, one bot user) turn a single shuffle
partition into the whole job's critical path. Two standard remedies:

- ``salted_aggregate``: groupBy(keys + salt) partial-aggregate, then
  re-aggregate without the salt. Decomposable aggs only (count/sum/min/
  max; avg = sum+count) — the salt spreads a hot key over N partitions
  and the merge is exact, so results are IDENTICAL to the direct groupBy
  (oracle-checked by q38).
- ``salted_join``: replicate the small-but-unbroadcastable side N× with a
  salt id, salt the skewed side's rows randomly, equi-join on keys+salt.
  Row-level salt assignment is random but the join RESULT is exactly the
  plain join (every replica carries the full payload).

AQE's skew-join handling (on by default in session.py) covers sort-merge
join skew at runtime; these are for the cases AQE can't see — skewed
aggregations and broadcast-ineligible dimension joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase groupBy: ``aggs`` is (fn, col, alias) with fn in
    count|sum|min|max; count uses col='*' or any column."""
    for fn, _, _ in aggs:
        if fn not in _MERGE:
            raise ValueError(f"non-decomposable agg {fn!r}; use sum+count for avg")
    salt = (F.rand(seed=42) * num_salts).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[getattr(F, fn)(col).alias(alias) for fn, col, alias in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, _MERGE[fn])(alias).alias(alias)
            for fn, _, alias in aggs
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    num_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the small side replicated ``num_salts``× so a
    hot key's rows spread over ``num_salts`` shuffle partitions."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(num_salts)])).alias("_salt")
    small_rep = small.select("*", salts)
    skewed_salted = skewed.withColumn(
        "_salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    return skewed_salted.join(small_rep, [*keys, "_salt"]).drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-key diagnostic for shuffle/join planning: per-key row counts
    for the ``top_n`` heaviest keys, each with its share of the table and
    its skew factor (count ÷ mean-count-per-key) — the number that tells
    you whether a join on this key needs salting (factor ≫ shuffle
    partition count) or AQE's skew split will absorb it.

    One hash aggregate + a global scalar aggregate broadcast back + a
    TakeOrderedAndProject top-n — no full sort, no driver-side data.
    Shares integerized (×10⁶) for engine-portable comparison.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_nkeys")
    )
    enriched = counts.crossJoin(F.broadcast(totals)).select(
        *key_cols,
        "n",
        F.floor(F.col("n") * 1_000_000.0 / F.col("_total") + 0.5)
        .cast("long")
        .alias("share_x1m"),
        F.floor(
            F.col("n") * F.col("_nkeys") * 1_000_000.0 / F.col("_total") + 0.5
        )
        .cast("long")
        .alias("skew_factor_x1m"),
    )
    return enriched.orderBy(
        F.col("n").desc(), *[F.col(c) for c in key_cols]
    ).limit(top_n)
