"""Distributed time-range join: pair rows whose timestamps fall within a
per-row window, without a nested-loop join.

Spark plans a raw ``a.ts BETWEEN b.ts - X AND b.ts`` condition as a
(broadcast) nested-loop join — quadratic per key and a non-starter at
100 TB. The standard fix is bucketing: quantize time into buckets at
least as wide as the window span, explode the probe side into the
(at most two) buckets its window can overlap, equi-join on
(keys…, bucket), then apply the exact range predicate. The join becomes
a shuffle hash/sort-merge equi-join whose fan-out is bounded by real
temporal locality, not |left|×|right|.

The as-of join (``operators.asof``) is the 1-nearest variant of this;
this operator returns ALL rows in the window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
) -> DataFrame:
    """Inner join of left×right on ``keys`` where
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Bucket width = max(window span, 1s); the left row's window overlaps at
    most ``ceil(span/width)+1 = 2`` buckets, enumerated with
    ``sequence()`` (no duplicate pairs — bucket ids are distinct by
    construction, so no distinct pass is needed).

    All arithmetic is in integer microseconds (``unix_micros``): the earlier
    ``unix_timestamp`` form truncated to whole seconds, so with µs-grained
    events a row up to ~1 s outside the true window could be accepted (or a
    boundary row rejected). Bounds are honored µs-exact; fractional-second
    ``lower/upper_seconds`` round to the nearest microsecond.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    lower_us = round(lower_seconds * 1_000_000)
    upper_us = round(upper_seconds * 1_000_000)
    width_us = max(upper_us - lower_us, 1_000_000)

    l_epoch = F.unix_micros(F.col(left_ts))
    r_epoch = F.unix_micros(F.col(right_ts))

    lo_bucket = F.floor((l_epoch + F.lit(lower_us)) / width_us).cast("long")
    hi_bucket = F.floor((l_epoch + F.lit(upper_us)) / width_us).cast("long")
    l = left.withColumn("_bucket", F.explode(F.sequence(lo_bucket, hi_bucket)))
    r = right.withColumn("_bucket", F.floor(r_epoch / width_us).cast("long"))

    joined = l.join(r, [*keys, "_bucket"]).drop("_bucket")
    lj = F.unix_micros(F.col(left_ts))
    rj = F.unix_micros(F.col(right_ts))
    return joined.where(
        (rj >= lj + F.lit(lower_us)) & (rj <= lj + F.lit(upper_us))
    )
