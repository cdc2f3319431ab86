"""Sessionization and event-stream batch operators over the ``events`` table.

The reference has no streaming/sessions (SURVEY.md §1.1: "Streaming does not
exist in the reference") — this is the batch half of the streaming extension
(§7.5); ``albedo_spark.streaming.events`` holds the Structured Streaming twin.

Scale notes: sessionize is one shuffle on user_id + two window passes over
the same partitioning (Catalyst reuses the sort); tumbling aggregation is a
plain hash aggregate on (window, type) — both linear, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    previous event of the same user reaches ``gap_minutes``.

    Boundary semantics match the Structured Streaming twin
    (``streaming.events.session_window_agg`` / Spark ``session_window``):
    microsecond-exact gaps, new session when gap >= gap_minutes (a session
    window is ``[start, last_event + gap)``, end-exclusive — an event landing
    exactly ``gap`` after the previous one opens a NEW session). The earlier
    whole-second ``>`` form diverged from the streaming half on boundary and
    sub-second cases.

    Classic lag + cumulative-sum-of-boundaries; both windows share one
    partitioning/ordering so Spark sorts once.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    boundary = F.when(
        gap.isNull() | (gap >= gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_boundary", boundary).withColumn(
        "session_seq", F.sum("_boundary").over(w)
    ).drop("_boundary")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session row counts and duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col(ts_col)).cast("long") - F.min(F.col(ts_col)).cast("long")).alias(
            "duration_sec"
        ),
        F.min(F.col(ts_col)).alias("session_start"),
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Tumbling-window aggregation (batch form of the streaming windowed agg):
    (window_start, key, count, avg value)."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "avg_value")
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
) -> DataFrame:
    """Hopping (sliding) window aggregation: every event lands in
    ``window/slide`` overlapping epoch-aligned windows — ``F.window`` with
    a slide emits one row per covering window BEFORE the aggregate, so the
    groupBy shuffle carries the duplication factor; at 100 TB pick
    slide as coarse as the report needs (factor = window/slide) rather
    than defaulting to fine-grained slides."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: how many users complete each prefix of
    ``steps`` in order (each step strictly after the previous one, and —
    with ``within_seconds`` — inside that window of step 1).

    Step k's earliest-completion time is a conditional ``min`` over the
    user's events after step k-1: one hash aggregate + one user-keyed
    equi-join per step, k small (funnels are 3-5 steps). Each step's
    reached-set is lazily ``localCheckpoint``-ed so step k reads k-1's
    one materialization instead of recomputing the whole chain per
    count — at scale the reached frame is one small row per surviving
    user. The per-step counts come back as a UNION of one-row
    aggregates computed in ONE action (the caller's), not k sequential
    persist+count driver jobs: k-1 scheduling barriers and the driver
    collect disappear, and the checkpoints dedupe the shared prefixes
    inside that single job. Everything stays key-partitioned; no window
    over the whole event stream, no per-user collect. Output:
    (step_index, step, n_users) with monotonically non-increasing
    counts.
    """
    us = F.unix_micros(F.col(ts_col))

    reached = None  # (user, _t_prev, _t0) frame for step-k-1 completers
    counts = []
    for i, step in enumerate(steps):
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), us.alias("_ts")
        )
        if reached is None:
            cur = ev.groupBy("u").agg(F.min("_ts").alias("_t"))
        else:
            joined = ev.join(reached, "u").where(
                F.col("_ts") > F.col("_t_prev")
            )
            if within_seconds is not None:
                joined = joined.where(
                    F.col("_ts") <= F.col("_t0") + within_seconds * 1_000_000
                )
            cur = joined.groupBy("u", "_t0").agg(F.min("_ts").alias("_t"))
        if i == 0:
            cur = cur.withColumn("_t0", F.col("_t"))
        reached = cur.select(
            "u", F.col("_t").alias("_t_prev"), "_t0"
        ).localCheckpoint(eager=False)
        counts.append(
            reached.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for nxt in counts[1:]:
        out = out.unionByName(nxt)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (cohort), counted in every later period they return —
    ``(cohort_period, period_offset, n_users)``, the classic retention
    triangle.

    JOIN-FREE: one ``collect_set(period)`` aggregate per user (the set is
    bounded by the number of periods the user was ever active in — weeks,
    not events — and ``collect_set`` de-dups map-side), the cohort is
    simply ``array_min`` of that set, and exploding it yields each user
    exactly once per (cohort, offset), so the final count is a plain
    ``count(*)``. Two shuffles total at any scale. Periods are integer
    epoch divisions (no calendar lib), so any engine reproduces the exact
    bucketing.
    """
    day_us = 86_400_000_000
    # integer `div` end-to-end: float division + cast is floor only while
    # the quotient stays in double's exact range, and the bucketing must
    # replay bit-identically in any engine
    period = F.expr(f"unix_micros(`{ts_col}`) div {day_us} div {period_days}")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.collect_set(period).alias("_ps")
    )
    return (
        per_user.select(
            F.array_min("_ps").alias("cohort"),
            F.explode("_ps").alias("_p"),
        )
        .groupBy("cohort", (F.col("_p") - F.col("cohort")).alias("period_offset"))
        .agg(F.count("*").alias("n_users"))
    )


def resample_ffill(
    events: DataFrame,
    step_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regular-grid resampling with forward fill: per user, one row every
    ``step_seconds`` from their first to their last event, carrying the
    most recent observed value — the gap-filling step before any
    fixed-frequency time-series model.

    Grid generation is a per-user ``sequence`` + explode (rows ∝ span ÷
    step, generated in parallel, never a driver loop); the fill is the
    as-of carry idiom (union grid + observations, one window sort per
    user, ``last(value, ignorenulls=True)``) — one shuffle on user, no
    range join, no per-user collect. Grid timestamps are integer epoch
    arithmetic, so any engine reproduces the exact grid.

    Tied observations (same user, same microsecond) resolve to the MAX
    value: the window sort ends on the value itself, making the order
    total in effect — rows that still tie are identical in the only
    column ``last`` reads, so no arrival-order dependence survives (the
    q58 (ts, event_id) lesson applied without an id requirement).
    """
    us = F.unix_micros(F.col(ts_col))
    step_us = step_seconds * 1_000_000
    span = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    )
    # grid points aligned to each user's first event
    grid = span.select(
        "u",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"(_hi - _lo) div {step_us}"),
            )
        ).alias("_k"),
        "_lo",
    ).select(
        "u", (F.col("_lo") + F.col("_k") * step_us).alias("_us"),
        F.lit(1).alias("_is_grid"),
    )
    obs = events.select(
        F.col(user_col).alias("u"), us.alias("_us"),
        F.lit(0).alias("_is_grid"),
        F.col(value_col).alias("_v"),
    )
    merged = grid.unionByName(obs, allowMissingColumns=True)
    w = (
        Window.partitionBy("u")
        # observations sort before grid points at the same instant, so a
        # grid point lands on the value observed AT its own timestamp;
        # the trailing value key makes tied instants deterministic (max wins)
        .orderBy(
            F.col("_us").asc(),
            F.col("_is_grid").asc(),
            F.col("_v").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_fv", F.last("_v", ignorenulls=True).over(w))
    return filled.where(F.col("_is_grid") == 1).select(
        F.col("u").alias(user_col),
        F.col("_us").alias("grid_us"),
        F.col("_fv").alias(value_col),
    )


def merge_intervals(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Union of overlapping-or-touching intervals per key (gaps-and-
    islands): coverage windows from per-event spans — the step between
    raw event durations and utilization/billing/on-call math.

    Classic single-window form: sort each key's intervals by (start, end),
    a new island begins where ``start`` exceeds the running max of all
    earlier ends (strictly — touching intervals merge), the island id is
    the running count of such breaks, and one groupBy collapses each
    island to (min start, max end, n_intervals). One shuffle + one sort
    per key, no self-join, no explode — the same shape at any interval
    count per key. Tie orders can't change the result: equal (start, end)
    rows merge into the same island either way, and the island id depends
    only on the sorted prefix's max end. Precondition: ``start <= end``
    per row (degenerate point intervals are fine; a negative-length
    interval would corrupt the running max — normalize with
    least/greatest first if the source can produce them).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (prev_max_end.isNull() | (F.col(start_col) > prev_max_end)).cast(
        "int"
    )
    islanded = intervals.withColumn(
        "_island",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islanded.groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_intervals"),
        )
        .drop("_island")
    )


def session_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Markov transition counts over consecutive events WITHIN a session:
    ``(from_type, to_type, n_transitions)`` — the path-analysis /
    next-event-model input (funnels ask "did they finish?", this asks
    "where do they go next?"). Session boundaries share ``sessionize``'s
    exact semantics, so transitions never leap a 30-minute gap.

    One shuffle on the user (the sessionize window), one more ordered
    window per (user, session) for the lag — Catalyst shares the sort —
    then a plain map-side-combinable count. The lag orders by
    ``(ts, id)``: tied timestamps resolve by the id, the q58 lesson, so
    every engine replays identical pairs.
    """
    s = sessionize(events, user_col, ts_col, gap_minutes)
    w = Window.partitionBy(user_col, "session_seq").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        s.withColumn("_from", F.lag(type_col).over(w))
        .where(F.col("_from").isNotNull())
        .groupBy(
            F.col("_from").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )
