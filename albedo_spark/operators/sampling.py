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


def mixture_sample(
    df: DataFrame,
    strat_col: str,
    weights: dict[str, int],
    key_col: str,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic corpus-mixture downsampling: keep a subset whose
    ``strat_col`` composition matches integer target ``weights`` (e.g.
    ``{"web": 6, "wiki": 3, "books": 1}``), keeping the binding stratum
    (the one scarcest relative to its weight) WHOLE and downsampling the
    rest — the standard pre-training data-mixing step.

    Everything is computed inside the engine — per-stratum counts are a
    tiny aggregate that broadcast-joins back onto the scan, so unlike
    ``stratified_split`` there is NO driver-side collect at any
    cardinality. Row selection is the catalog's engine-portable md5 rule
    (cf. q31): ``u = int(md5(key)[:8], 16) % resolution < floor(rate *
    resolution)``, so an external oracle replays the exact same rows.
    Strata absent from ``weights`` are dropped.

    Rate algebra (all inside SQL): ``rate_s = w_s * min_t(c_t / w_t) /
    c_s`` — the unique per-stratum rates that hit the target mixture with
    max(rate) = 1. The float divisions are the same IEEE expression in
    any engine, and the comparison is integerized through ``floor``, so
    cross-engine replay is exact.
    """
    w_expr = F.create_map(
        *[F.lit(x) for s, w in weights.items() for x in (s, w)]
    )
    tagged = df.where(F.col(strat_col).isin(list(weights))).withColumn(
        "_w", w_expr[F.col(strat_col)].cast("double")
    )
    counts = tagged.groupBy(strat_col, "_w").agg(F.count("*").alias("_c"))
    scale = counts.agg(
        F.min(F.col("_c").cast("double") / F.col("_w")).alias("_scale")
    )
    rates = counts.crossJoin(F.broadcast(scale)).select(
        strat_col,
        # +0.5 (round-half-up): the binding stratum's rate is exactly 1 in
        # real arithmetic but can land at 1 - 1ulp in float; bare floor
        # would then shave 1/resolution of the stratum it promises to keep
        # whole.
        F.floor(
            F.col("_w") * F.col("_scale") / F.col("_c").cast("double")
            * resolution
            + F.lit(0.5)
        ).alias("_thr"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % resolution
    )
    return (
        tagged.join(F.broadcast(rates), strat_col)
        .where(u < F.col("_thr"))
        .drop("_w", "_thr")
    )


def soft_quality_sample(
    df: DataFrame,
    score_col: str,
    key_col: str,
    lo: int,
    hi: int,
    floor_x10k: int = 1000,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Quality-PROPORTIONAL soft sampling (the FineWeb-class
    alternative to a hard quality cutoff): keep-probability ramps
    linearly from ``floor_x10k``/10⁴ at ``score <= lo`` up to 1 at
    ``score >= hi``, so borderline documents survive at reduced rate
    instead of a cliff at one threshold — hard cutoffs systematically
    delete whole styles (dialogue, lists, code comments) that score
    low but carry diversity; a soft ramp keeps a calibrated fraction.

    Selection is the catalog's engine-portable md5 rule (cf. q31 /
    mixture_sample): ``u = int(md5(key)[:8], 16) % resolution`` kept
    iff ``u < thr(score)``, with

        thr = floor_res                          score <= lo
            = resolution                         score >= hi
            = floor_res + (resolution - floor_res)·(score - lo)
                          // (hi - lo)           otherwise

    — all integer arithmetic (the one division is floored; the double
    quotient is correctly rounded and the operands stay far below
    2^53, so truncation equals exact integer division in any engine).
    One map-only scan: no shuffle, no state, replays bit-for-bit."""
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    floor_res = resolution * floor_x10k // 10000
    span = resolution - floor_res
    score = F.col(score_col).cast("long")
    thr = (
        F.when(score >= hi, F.lit(resolution).cast("long"))
        .when(score <= lo, F.lit(floor_res).cast("long"))
        .otherwise(
            F.lit(floor_res)
            + F.floor(
                (F.lit(span) * (score - F.lit(lo))) / F.lit(hi - lo)
            ).cast("long")
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % resolution
    )
    return df.where(u < thr)


def temperature_mixture(
    df: DataFrame,
    strat_col: str,
    key_col: str,
    sqrt_iters: int = 1,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled corpus rebalancing (the multilingual sampling
    rule of mT5/XLM-R, α-weighted mixing): keep a subset whose stratum
    sizes are ∝ ``c_s^α`` with ``α = 1/2^sqrt_iters`` — larger strata
    are downsampled harder, the smallest stratum is kept WHOLE (its rate
    is exactly 1), so low-resource languages/domains stop drowning.
    ``mixture_sample`` is the same machinery with EXPLICIT target
    weights; here the weights derive from the observed counts.

    Per-stratum keep-rate: ``rate_s = (c_min / c_s)^(1-α)``; with
    α = 1/2^k that is ``nested_sqrt_k(c_min/c_s) ** (2^k - 1)`` — but we
    avoid pow entirely by iterating the identity
    ``x^(1-1/2^k) = x / x^(1/2^k)``: one IEEE division of counts, k
    nested sqrts, one final division. α is restricted to the 1/2^k
    family BY DESIGN: sqrt and division are correctly-rounded in every
    IEEE-754 engine so the oracle replays the rate bit-for-bit, while a
    general ``pow(x, α)`` carries no cross-engine determinism guarantee
    — the same reasoning that keeps transcendental logs out of the gated
    surface (cf. textstats.bigram_lm_scores). Row selection is the
    catalog's engine-portable md5 rule; the float-vs-int comparison is
    integerized through floor(+0.5) exactly as ``mixture_sample``.
    NULL strata are dropped (no target size is derivable for them).

    At 100 TB: one tiny per-stratum aggregate broadcast back onto the
    scan — no driver collect, no extra shuffle on the data path, same
    plan shape as ``mixture_sample``.
    """
    counts = df.where(F.col(strat_col).isNotNull()).groupBy(strat_col).agg(
        F.count("*").alias("_c")
    )
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    ratio = F.col("_cmin").cast("double") / F.col("_c").cast("double")
    root = ratio
    for _ in range(sqrt_iters):
        root = F.sqrt(root)
    rate = ratio / root  # x / x^(1/2^k) = x^(1 - α)
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        strat_col,
        F.floor(rate * resolution + F.lit(0.5)).alias("_thr"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % resolution
    )
    return (
        df.join(F.broadcast(rates), strat_col)
        .where(u < F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement: each row
    draws a deterministic pseudo-uniform u from the engine-portable md5
    rule and competes on the key ``ln(u) / w`` (the log-monotone form of
    u^(1/w)); the k LARGEST keys win. Inclusion probability is
    proportional to weight, no replacement, single pass + one top-k
    (`TakeOrderedAndProject`-shaped limit, never a full sort at scale
    when combined with per-partition partial top-k — Spark's
    sort+limit does exactly that).

    Deterministic: same data → same sample, replayable in any engine
    with md5 (the u32 is shifted by +1 so u is never 0 and the log never
    hits -inf). Rows with non-positive weight are excluded.
    """
    u32 = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    u = (u32 + 1).cast("double") / F.lit(float(2**32 + 1))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(key_col))
        .limit(k)
        .drop("_es_key")
    )


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


def group_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic sample of ``k`` rows per group — the
    inspect-a-few-rows-per-stratum tool (debugging skewed keys, eyeballing
    per-language corpus slices) that ``LIMIT`` can't express and
    ``TABLESAMPLE`` can't stratify.

    The draw is ``md5(salt || id)`` ranked within the group: uniform-ish,
    engine-portable (any oracle replays the exact sample), and stable
    across runs/partitionings — change ``salt`` to redraw. One window
    shuffle on the group key; rank short-circuits at ``k`` per group
    (WindowGroupLimit pushes the filter into the sort at execution).
    Output = input columns + ``sample_rank`` (1-based). The weighted
    no-replacement twin is ``weighted_sample_without_replacement``.
    """
    from pyspark.sql import Window

    draw = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(draw.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def shuffle_shards(
    df: DataFrame,
    num_shards: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle-and-shard — the LAST stage of a
    pre-training data pipeline: training wants the corpus in randomized
    order split into equal-ish shards consumed sequentially, and the
    randomization must be reproducible (same corpus + same salt → the
    same shard layout, on any engine). Output = input columns +
    ``shard`` (0-based) + ``pos`` (1-based position within the shard).

    The draw is ``md5(salt || id)`` (the ``group_sample`` idiom): shard =
    first 32 bits of the draw mod ``num_shards`` (uniform-ish), position
    = rank of the draw within the shard — so row order within a shard is
    itself pseudo-random, not source order. Change ``salt`` to reshuffle
    between epochs without touching the data.

    Scale shape: ONE shuffle on the shard id, then a per-shard sort for
    the positions — inherent to materializing a total order per shard,
    and exactly the sort a sharded training-data writer needs anyway.
    Size ``num_shards`` so one shard fits a task's spill budget (e.g.
    10k shards for a 100 TB corpus → 10 GB sorted per task, disk-backed);
    more shards = more parallelism and smaller sorts.
    """
    from pyspark.sql import Window

    draw = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(draw, 1, 8), 16, 10).cast("long")
        % F.lit(num_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(draw.asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def epoch_plan(
    df: DataFrame,
    strat_col: str,
    weights: dict[str, int],
    token_budget: int,
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-stratum repeat plan for a fixed training token budget — the
    data table a pre-training run ships (the LLaMA-style "sampling prop /
    epochs" breakdown): ``(stratum, n_tokens, weight, target_tokens,
    epochs_x10k)``. Each stratum's share of the budget is proportional to
    its integer weight; ``epochs`` is how many passes over the stratum
    that share implies (> 1 ⇒ the source repeats, the signal data teams
    watch for overfit-prone upsampling).

    ALL arithmetic is BIGINT floor-division (``DIV``): budget·weight can
    reach 10^18-scale so the multiply stays in long range for any real
    budget, and there is no double anywhere — both engines derive
    identical integers with no rounding discipline needed. One tiny
    aggregate (|strata| rows) — the plan itself is driver-free; empty
    strata (0 tokens) are excluded rather than dividing by zero, but
    their weight STAYS in the denominator: the mixture is the CONFIGURED
    one, so a missing source leaves its budget share unassigned instead
    of silently redistributing it over the others."""
    wsum = sum(weights.values())
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(v))]
    )
    counts = (
        df.where(F.col(strat_col).isin(*weights))
        .groupBy(strat_col)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
    )
    weight = wmap[F.col(strat_col)].cast("long")
    target = F.expr(
        f"CAST({token_budget} AS BIGINT) * weight DIV {wsum}"
    )
    return (
        counts.withColumn("weight", weight)
        .withColumn("target_tokens", target)
        .withColumn(
            "epochs_x10k",
            F.expr("target_tokens * 10000 DIV n_tokens"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    test_x10k: int = 2500,
    salt: str = "",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Group-aware train/test split that CANNOT leak near-duplicates
    across the boundary: rows connected by a ``pairs`` edge (near-dup
    verdicts, same-source provenance, same-author links) always land on
    the same side, because the unit of assignment is the connected
    COMPONENT, not the row. A row-level random split puts one member of
    a near-dup pair in train and its twin in test, and the eval silently
    measures memorization — the standard contamination failure this
    operator exists to prevent (the split-side complement of q69/q118's
    decontamination, which guards against a FIXED benchmark; this guards
    eval splits drawn from the corpus itself).

    Components come from ``dedup.connected_components`` (min-id label,
    O(log diameter) rounds); rows with no edge form singleton groups
    (their own id). The side draw is the house md5 rule on the GROUP id
    (first 32 hash bits mod 10^4 < ``test_x10k`` → test), so any engine
    replays the exact assignment and re-runs are stable under
    repartitioning. Expected test mass is test_x10k/10^4 of GROUPS —
    near-dup-heavy corpora put slightly more rows than groups into
    whichever side big components land on, which is inherent to
    leakage-safety (the alternative is leaking). Output = input columns
    + ``split_group`` + ``split`` ('train'/'test').

    Scale: the component frame is |connected nodes| rows (sparse — only
    docs with at least one edge), joined once on id; the draw is a pure
    per-row expression. One join + the component loop's own shuffles.
    """
    from albedo_spark.operators.dedup import connected_components

    comps = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("node").alias(id_col), F.col("label").alias("_comp")
    )
    joined = df.join(comps, id_col, "left").withColumn(
        "split_group",
        F.coalesce(F.col("_comp"), F.col(id_col).cast("long")),
    ).drop("_comp")
    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(salt), F.col("split_group").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return joined.withColumn(
        "split",
        F.when(draw < test_x10k, F.lit("test")).otherwise(F.lit("train")),
    )
