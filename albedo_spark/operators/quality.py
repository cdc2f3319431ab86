"""Declarative data-quality constraint checking (no reference twin —
warehouse-maintenance extension surface, same family as merge/io sinks;
the Deequ/dbt-test shape re-expressed as one Spark aggregate).

A check suite compiles into a SINGLE aggregation pass over the table:
every row-level predicate becomes a conditional sum, uniqueness becomes a
``count - count_distinct`` pair, and the whole suite is one
map-side-combinable HashAggregate — at 100 TB the suite costs one scan
regardless of how many checks it carries. Referential checks (which need
the other table) are the one exception: each adds a broadcast-or-shuffle
anti-join semi-reduced to a count.

Output: one row per check — ``(check, violations, n_rows, passed)`` —
small enough to collect, alert on, or append to a run-ledger table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq(label: str) -> str:
    """SQL single-quoted string literal (labels embed column names, which
    may legally contain quotes — never splice them raw into expr())."""
    return "'" + label.replace("'", "''") + "'"


def _bt(name: str) -> str:
    """Backtick-quoted identifier reference, backticks escaped."""
    return "`" + name.replace("`", "``") + "`"


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violation`` is a row-level Column predicate
    that is TRUE when the row VIOLATES the constraint."""

    name: str
    violation: Column


@dataclass
class CheckSuite:
    checks: list[Check] = field(default_factory=list)

    def not_null(self, col: str) -> "CheckSuite":
        self.checks.append(Check(f"not_null({col})", F.col(col).isNull()))
        return self

    def in_range(self, col: str, lo, hi) -> "CheckSuite":
        c = F.col(col)
        self.checks.append(
            Check(
                f"in_range({col},{lo},{hi})",
                c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
            )
        )
        return self

    def accepted_values(self, col: str, values: list) -> "CheckSuite":
        c = F.col(col)
        self.checks.append(
            Check(
                f"accepted_values({col})",
                c.isNotNull() & ~c.isin(values),
            )
        )
        return self

    def matches(self, col: str, pattern: str) -> "CheckSuite":
        c = F.col(col)
        self.checks.append(
            Check(
                f"matches({col})",
                c.isNotNull() & ~c.rlike(pattern),
            )
        )
        return self

    def custom(self, name: str, violation: Column) -> "CheckSuite":
        self.checks.append(Check(name, violation))
        return self


def run_checks(
    df: DataFrame,
    suite: CheckSuite,
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Execute the suite in one aggregate pass (+ one distinct-count per
    uniqueness key-set, still inside the same aggregate).

    ``unique_keys``: e.g. ``[["o_orderkey"], ["o_custkey", "o_orderdate"]]``
    — each becomes a ``unique(...)`` check whose violation count is
    ``n_rows - n_distinct_keys`` (0 when the key-set is unique).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in suite.checks:
        aggs.append(
            F.sum(F.when(c.violation, 1).otherwise(0)).alias(f"_v_{c.name}")
        )
    for ks in unique_keys or []:
        label = "unique(" + ",".join(ks) + ")"
        aggs.append(
            F.count_distinct(*[F.col(k) for k in ks]).alias(f"_d_{label}")
        )
    row = df.agg(*aggs)

    pieces = []
    for c in suite.checks:
        pieces.append(f"{_sq(c.name)}, CAST({_bt('_v_' + c.name)} AS BIGINT)")
    for ks in unique_keys or []:
        label = "unique(" + ",".join(ks) + ")"
        pieces.append(f"{_sq(label)}, CAST(_n - {_bt('_d_' + label)} AS BIGINT)")
    stacked = row.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(pieces)}, "
            + ", ".join(pieces)
            + ") AS (check, violations)"
        ),
    )
    return stacked.select(
        "check",
        F.col("violations").cast("long").alias("violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("violations") == 0).alias("passed"),
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity check as a broadcast-friendly anti-join count:
    rows in ``child`` whose ``child_key`` has no match in ``parent``.
    Same output shape as ``run_checks`` so suites union cleanly."""
    n_rows = child.count()
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .count()
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [(f"referential({child_key}->{parent_key})", orphans, n_rows, orphans == 0)],
        "check string, violations long, n_rows long, passed boolean",
    )


def iqr_outlier_summary(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    factor: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier profile per group: quartiles via one exact
    ``percentile`` aggregate, then a conditional re-aggregation counting
    values outside ``[q1 - f*iqr, q3 + f*iqr]`` — two passes total
    regardless of group count, both map-side-combinable hash aggregates
    (the bounds frame is tiny and broadcast-joins back onto the scan).

    The standard numeric data-quality screen (fat-finger prices, sensor
    spikes) at table scale. Output per group: (group, n, q1, q3, lo, hi,
    n_low, n_high).
    """
    gcols = group_cols or []
    bounds = df.groupBy(*gcols).agg(
        F.expr(f"percentile({_bt(value_col)}, 0.25)").alias("q1"),
        F.expr(f"percentile({_bt(value_col)}, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - factor * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + factor * (F.col("q3") - F.col("q1"))
    bounds = bounds.select(*gcols, "q1", "q3", lo.alias("lo"), hi.alias("hi"))
    joined = (
        df.join(F.broadcast(bounds), gcols) if gcols
        else df.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col)
    return joined.groupBy(*gcols, "q1", "q3", "lo", "hi").agg(
        F.count(value_col).alias("n"),
        F.sum(F.when(v < F.col("lo"), 1).otherwise(0)).alias("n_low"),
        F.sum(F.when(v > F.col("hi"), 1).otherwise(0)).alias("n_high"),
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
) -> DataFrame:
    """One-pass numeric table profile: per column — row count, nulls,
    distinct, min, max, and mean — in LONG format ``(column, stat,
    value)`` (doubles; counts exact). The data-discovery twin of
    ``run_checks``: however many columns ride along, the table is scanned
    once (a single map-side-combinable aggregate), and the result is a
    handful of rows.

    Means are emitted as ``sum/count`` computed in double — callers
    needing cross-engine exactness should integerize like the catalog
    queries do; min/max/counts are exact.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.count_distinct(col).alias(f"_dist_{c}"),
            F.min(col).alias(f"_min_{c}"),
            F.max(col).alias(f"_max_{c}"),
            F.sum(col).alias(f"_sum_{c}"),
        ]
    row = df.agg(*aggs)
    pieces = []
    for c in numeric_cols:
        for stat, expr in (
            ("n_rows", "_n"),
            ("n_null", _bt(f"_null_{c}")),
            ("n_distinct", _bt(f"_dist_{c}")),
            ("min", _bt(f"_min_{c}")),
            ("max", _bt(f"_max_{c}")),
            ("mean", f"{_bt(f'_sum_{c}')} / (_n - {_bt(f'_null_{c}')})"),
        ):
            pieces.append(f"{_sq(c)}, {_sq(stat)}, CAST({expr} AS DOUBLE)")
    stacked = row.select(
        F.expr(
            f"stack({len(pieces)}, " + ", ".join(pieces)
            + ") AS (column, stat, value)"
        )
    )
    return stacked


def rolling_zscore(
    events: DataFrame,
    window_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Trailing-window z-score per key — the streaming-ish anomaly signal
    ("is this reading unusual vs this key's last hour?") computed in
    batch: for each event, mean/std over the key's values in the trailing
    ``window_seconds`` RANGE frame (inclusive of the current row), and
    the integerized z-score.

    Exactness discipline: the window moments are INTEGER sums of
    ``floor(value·10⁴ + 0.5)`` — a trailing double sum folds in
    engine-specific order (Spark incremental vs DuckDB segment-tree) and
    would split hashes, while integer sums are order-independent; both
    engines then derive mean/σ/z in double from bit-identical operands
    (the q87 integer-cents lesson applied to window frames). σ = 0 (or a
    single-row frame) yields z = 0 by definition. One shuffle + one sort
    per key; the frame bound is value-based so tied timestamps share the
    identical frame. The integer squares bound the usable value range to
    |value| < ~3e5 per 9.2e18/long (beyond that ANSI mode raises rather
    than silently wrapping — rescale the fixed-point factor for such
    series).
    """
    from pyspark.sql import Window

    v = F.floor(F.col(value_col) * F.lit(10_000.0) + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    base = events.select(
        F.col(id_col),
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        v.alias("_v"),
    ).select(
        id_col,
        key_col,
        ts_col,
        value_col,
        "_v",
        F.count("*").over(w).alias("_n"),
        F.sum("_v").over(w).alias("_s1"),
        F.sum(F.col("_v") * F.col("_v")).over(w).alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_n")
    var = F.col("_s2") / F.col("_n") - mean * mean
    z = F.when(
        (F.col("_n") > 1) & (var > 0),
        (F.col("_v") - mean) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return base.select(
        id_col,
        key_col,
        F.col("_n").cast("long").alias("n_window"),
        F.floor(z * F.lit(100.0) + F.lit(0.5)).cast("long").alias("z_x100"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: "list[tuple[str, int]]",
) -> DataFrame:
    """Pearson correlation for every column pair in ONE table scan →
    ``(col_a, col_b, corr_x10k)`` — the profiling staple next to
    ``profile_columns``, engine-exact where a naive float implementation
    is not: each value integerizes per row as ``floor(x·scale + 0.5)``
    (``cols`` is ``[(name, scale)]`` — pick scale so
    ``(max·scale)²·n < 2^63``), all five moments per pair (n, Σx, Σy,
    Σxy, Σx², Σy²) are EXACT BIGINT sums — order-independent, so shuffle
    order cannot move the answer — and only the final closed formula
    ``r = (nΣxy − ΣxΣy) / √((nΣx²−Σx²ᵗᵒᵗ)(nΣy²−Σy²ᵗᵒᵗ))`` runs in
    doubles, as one fixed IEEE op sequence both engines replay.

    Rows with a NULL in ANY profiled column are dropped up front
    (listwise deletion — one consistent n for every pair). Single
    map-side-combinable aggregate; the result is |pairs| rows. At PB
    scale the BIGINT headroom rule above is the only sizing decision —
    everything else is a constant-state aggregate.
    """
    clean = df.where(
        F.expr(" AND ".join(f"{name} IS NOT NULL" for name, _ in cols))
    )
    ints = clean.select(
        *[
            F.floor(F.col(name) * F.lit(float(scale)) + F.lit(0.5))
            .cast("long")
            .alias(name)
            for name, scale in cols
        ]
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = [name for name, _ in cols]
    for c in names:
        aggs += [
            F.sum(F.col(c)).alias(f"_s_{c}"),
            F.sum(F.col(c) * F.col(c)).alias(f"_q_{c}"),
        ]
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"_p_{a}_{b}"))
    # one 1-row frame feeding |pairs| projections — checkpoint lazily so
    # the scan+aggregate runs once, not once per pair branch
    row = ints.agg(*aggs).localCheckpoint(eager=False)
    out = []
    for a, b in pairs:
        num = (
            F.col("_n").cast("double") * F.col(f"_p_{a}_{b}").cast("double")
            - F.col(f"_s_{a}").cast("double") * F.col(f"_s_{b}").cast("double")
        )
        den = F.sqrt(
            (
                F.col("_n").cast("double") * F.col(f"_q_{a}").cast("double")
                - F.col(f"_s_{a}").cast("double") * F.col(f"_s_{a}").cast("double")
            )
            * (
                F.col("_n").cast("double") * F.col(f"_q_{b}").cast("double")
                - F.col(f"_s_{b}").cast("double") * F.col(f"_s_{b}").cast("double")
            )
        )
        # zero-variance column → r undefined: NULL by contract (a NaN
        # would throw on the ANSI long cast and hash differently anyway)
        corr = F.when(
            den > 0,
            F.floor(num / den * F.lit(10000.0) + F.lit(0.5)).cast("long"),
        )
        out.append(
            row.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr.alias("corr_x10k"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def chi2_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
) -> DataFrame:
    """Two-sample chi-square drift between two snapshots' categorical
    distributions → one row per category ``(key, n_a, n_b,
    chi2_contrib_x10k)`` — the distribution-level drift monitor that
    ``snapshot_diff`` (row-level CDC) doesn't cover: "did the LANGUAGE
    MIX of yesterday's crawl shift", not "which rows changed". Sum the
    contribution column for the chi-square statistic (df = k−1 per
    side).

    Contingency-table expected counts stay EXACT rationals:
    ``e = row_total · col_total / grand``, so each contribution
    ``(o−e)²/e`` becomes the integer expression
    ``(o·g − r·c)² · 10^4 DIV (g·r·c)`` — BIGINT end-to-end,
    order-independent, replayed identically by the oracle. Headroom
    bound like q138: ``(o·g)² · 10^4 < 2^63`` — at larger counts scale
    both snapshots down proportionally first (chi-square contributions
    are homogeneous in the counts). Categories absent on one side count
    as 0 there (full-outer join), never dropped — appearing/vanishing
    categories are exactly the drift worth flagging.

    Plan: one count aggregate per snapshot, a full-outer join on the
    category key (|categories| rows), the two totals broadcast. Nothing
    scales with row count past the first aggregates.
    """
    ca = df_a.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n_a"))
    cb = df_b.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n_b"))
    joined = (
        ca.join(cb, "key", "full_outer")
        .select(
            "key",
            F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
        )
        .localCheckpoint(eager=False)
    )
    totals = joined.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .withColumn("_r", F.col("n_a") + F.col("n_b"))
        .withColumn("_g", F.col("_ta") + F.col("_tb"))
        .select(
            "key",
            "n_a",
            "n_b",
            # an EMPTY snapshot has no expected counts — its side
            # contributes 0 instead of dividing by zero (the comparison
            # is degenerate; the caller still sees the other side's term)
            (
                F.when(
                    F.col("_ta") > 0,
                    F.expr(
                        "(10000 * (n_a*_g - _r*_ta) * (n_a*_g - _r*_ta))"
                        " div (_g * _r * _ta)"
                    ),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("_tb") > 0,
                    F.expr(
                        "(10000 * (n_b*_g - _r*_tb) * (n_b*_g - _r*_tb))"
                        " div (_g * _r * _tb)"
                    ),
                ).otherwise(F.lit(0))
            ).alias("chi2_contrib_x10k"),
        )
    )


def per_group_quantile_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    q_num: int = 1,
    q_den: int = 4,
) -> DataFrame:
    """Adaptive per-group quality thresholding (the CCNet per-language
    perplexity-bucket idea): keep rows whose integer score is ≥ their
    GROUP's exact q-quantile cutoff, where the cutoff is the value at
    rank ``ceil(q·n)`` under the total order (score asc, id asc). A
    single global threshold over a multilingual corpus filters whole
    languages out (scores aren't comparable across groups); a per-group
    quantile keeps the same survivor fraction everywhere.

    Exact rational quantile (q = num/den, rank via BIGINT ceil-division)
    over an INTEGER score column — both engines derive the identical
    cutoff, no percentile-interpolation or float-comparison ambiguity.
    Output = surviving rows + their group's ``cutoff`` column.

    Plan: ONE window pass per group computes (row_number, count) → the
    cutoff rows (one per group) join back broadcast (|groups| rows).
    The scored input is lazily checkpointed — it feeds the window AND
    the survivor join. At 100 TB the exact form is a per-group sort
    (fully parallel across groups, skew-bounded by the largest group);
    swap the cutoff subquery for ``approx_percentile`` when an
    ε-approximate threshold is acceptable — the join-back shape is
    unchanged.
    """
    from pyspark.sql import Window

    scored = df.localCheckpoint(eager=False)
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    cuts = (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .where(F.col("_rn") == F.expr(f"({q_num}*_n + {q_den} - 1) div {q_den}"))
        .select(F.col(group_col), F.col(score_col).alias("cutoff"))
    )
    return scored.join(F.broadcast(cuts), group_col).where(
        F.col(score_col) >= F.col("cutoff")
    )


def hygiene_transform(
    docs: DataFrame,
    blocklist: "list[str] | None" = None,
    min_quality_x10k: int | None = None,
    strip: bool = True,
    redact: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """The map-only hygiene front of the pipeline as ONE composable
    transform: markup off → PII redacted → blocklist verdict → quality
    floor, in that order (strip first so scores and blocklist matching
    see extracted text, redact before scoring is deliberate too — the
    placeholder tokens are what a trained model would see). Pure
    projection + filter — no aggregate, no join, no state — so the SAME
    function body drives batch (``df.transform(hygiene_transform)``) and
    Structured Streaming (apply to a ``readStream`` frame; stateless
    maps need no watermark and support append mode), pinned by the
    batch-vs-stream equality test. NULL-text rows pass every stage
    untouched (the package's contentless-row precedent: strip/redact of
    NULL is NULL, blocklist and quality gates coalesce their way past).

    At 100 TB this is the free-rider stage: a single whole-stage-codegen
    scan with zero Exchange, whether the source is a parquet lake or a
    stream of crawl drops."""
    from albedo_spark.functions.text import redact_pii, strip_markup
    from albedo_spark.operators.textstats import (
        blocklist_hits,
        quality_score_x10k,
    )

    out = docs
    text = F.col(text_col)
    if strip:
        out = out.withColumn(
            text_col, F.when(text.isNotNull(), strip_markup(text)).otherwise(text)
        )
    if redact:
        out = out.withColumn(
            text_col, F.when(text.isNotNull(), redact_pii(text)).otherwise(text)
        )
    if blocklist:
        out = out.where(
            F.coalesce(blocklist_hits(text, blocklist), F.lit(0)) <= 0
        )
    if min_quality_x10k is not None:
        out = out.where(
            text.isNull() | (quality_score_x10k(text) >= min_quality_x10k)
        )
    return out
