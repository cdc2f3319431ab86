"""Mergeable sketches as plain DataFrames: count-min (Cormode &
Muthukrishnan 2005) for frequencies and HyperLogLog (Flajolet 2007) for
cardinalities — the bounded-memory answers to "how often does each key
occur" / "how many distinct keys" when the key universe is too
hot-skewed or too wide for an exact groupBy to be worth its shuffle.

Why a sketch when Spark can groupBy anything: at 100 TB an exact
frequency table over a heavy-tailed key column (URLs, n-grams, user ids)
is itself a giant table that must shuffle, store, and re-shuffle on every
merge; a CMS is ``depth × width`` BIGINT cells REGARDLESS of key
cardinality, merges by elementwise addition (partial-aggregate friendly,
cross-day/cross-batch composable — the q90 store discipline at sketch
granularity), and answers point queries with one-sided error: estimates
NEVER undercount, and overcount by ≤ ε·N with probability 1-δ at
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Engine-portable by construction: the d hash functions are md5 over
``"cms:<row>:" || key`` (the q31 draw), buckets are BIGINT mod, cells are
integer sums — DuckDB replays the identical sketch cell-for-cell, so the
gate hashes the actual registers, not a tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: cms_heavy_hitters probe-path switch: at or below this many total
#: cells the grid folds into ONE broadcast array row (element_at
#: probes, zero joins); above it the per-row broadcast-join chain keeps
#: the build out of any single aggregate task. 2^20 cells = 8 MB of
#: BIGINTs — comfortably broadcast-scale, far past the default 4×64.
_CMS_ARRAY_CELLS_MAX = 1 << 20


def _buckets(key, depth: int, width: int):
    """Array of the d md5-derived bucket ids for one key."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cms:{r}:"), key)), 1, 8),
                16,
                10,
            ).cast("long")
            % width
            for r in range(depth)
        ]
    )


def build_cms(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a key column → ``(row, bucket, cell)`` with
    exactly ``depth × width`` rows (absent cells materialized as 0 so two
    sketches union/merge positionally). ``weight_col`` turns it into a
    weighted-frequency sketch (e.g. token counts instead of doc counts).

    Plan: one projection fanning each input row into ``depth`` (row,
    bucket) pairs + ONE partial-aggregated shuffle of at most
    depth×width groups — the reduce side is constant-size no matter how
    many input rows or distinct keys. The zero-fill frame is a cross of
    two tiny ranges (broadcast scale by construction).
    """
    from albedo_spark.io import widen

    key = F.col(key_col).cast("string")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    # depth md5 chains per input row fuse into the scan stage — balance
    # an unsplittable scan so the hashing fills the cores (no-op when
    # the scan already does; guide §2.5 input skew), projected first to
    # the columns the sketch reads so a wide fact row never crosses the
    # balancing exchange (guide §2.3)
    df = widen(df.select(key_col, *([weight_col] if weight_col else [])))
    pairs = df.select(
        F.posexplode(_buckets(key, depth, width)).alias("row", "bucket"),
        w.alias("_w"),
    )
    counts = pairs.groupBy("row", "bucket").agg(F.sum("_w").alias("cell"))
    spark = df.sparkSession
    grid = (
        spark.range(depth)
        .select(F.col("id").cast("int").alias("row"))
        .crossJoin(spark.range(width).select(F.col("id").alias("bucket")))
    )
    return grid.join(counts, ["row", "bucket"], "left").select(
        "row", "bucket", F.coalesce(F.col("cell"), F.lit(0)).cast("long").alias("cell")
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Elementwise sum of two sketches with identical (depth, width) —
    the mergeability that makes CMS a per-batch/per-partition rollup:
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY, pinned in
    tests. One union + one constant-size aggregate."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates for a (small, broadcast) key frame:
    ``est = min over rows of cell[row][h_row(key)]`` — the one-sided CMS
    read. ``depth``/``width`` are constants of the sketch, passed rather
    than inferred (no driver round-trip). The d probe cells per key join
    against the sketch broadcast-side; one min-aggregate per key.
    Estimates NEVER undercount (pinned in tests)."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.posexplode(_buckets(key, depth, width)).alias("row", "bucket"),
    )
    return (
        sketch.join(F.broadcast(probes), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cell").alias("est"))
    )


def _check_hll_m(m: int) -> None:
    """Shared validation for the HLL builder/estimator pair: the sentinel
    arithmetic (2^54 rho cap, 55-reg shift base) and the alpha constants
    are only correct for power-of-two m >= 64 — see build_hll's
    docstring for the derivation."""
    if m < 64 or (m & (m - 1)) != 0:
        raise ValueError(
            f"HLL m must be a power of two >= 64 (got {m}): the 2^54 rho "
            "sentinel and the m>=128 alpha formula are wrong below that"
        )


def build_hll(df: DataFrame, key_col: str, m: int = 64) -> DataFrame:
    """HyperLogLog registers as a DataFrame → ``(bucket, reg)`` with
    exactly ``m`` rows (empty buckets materialized at 0) — the
    cardinality sibling of ``build_cms``: constant size regardless of
    input, map-side partial aggregation (max combines), and EXACT
    mergeability (elementwise max, ``merge_hll``).

    Engine-portable register math, no floats anywhere: the 60-bit
    md5-prefix hash splits into ``bucket = h mod m`` and a 54-bit tail
    ``w``; the register is the tail's number of trailing zeros + 1,
    computed with the lsb trick ``bit_count((x & -x) - 1) + 1`` over
    ``x = w + 2^54`` (the sentinel bit caps rho for w = 0) — bit_count
    and integer ops round nowhere, so DuckDB rebuilds the identical
    registers (pinned by the q136 gate).

    ``m`` must be a power of two with m >= 64: the 2^54 sentinel caps rho
    only when the 60-bit hash tail ``_h div m`` fits under it (m >= 64
    → tail < 2^54), and the alpha table in ``hll_estimate`` starts at
    m = 64. Smaller m would silently overflow the register bound and
    feed ``shiftleft`` a negative count (masked mod 64 by the JVM into
    garbage), so it is rejected loudly instead.
    """
    from albedo_spark.io import widen

    _check_hll_m(m)
    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), key)), 1, 15), 16, 10
    ).cast("long")
    sentinel = 1 << 54
    df = widen(df)  # per-row md5 register math — same balancing as build_cms
    rows = df.select(h.alias("_h")).select(
        F.expr(f"_h % {m}").alias("bucket"),
        F.expr(
            f"bit_count((((_h div {m}) + {sentinel})"
            f" & -((_h div {m}) + {sentinel})) - 1) + 1"
        ).alias("rho"),
    )
    regs = rows.groupBy("bucket").agg(F.max("rho").alias("reg"))
    grid = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    return grid.join(regs, "bucket", "left").select(
        "bucket", F.coalesce(F.col("reg"), F.lit(0)).cast("int").alias("reg")
    )


def merge_hll(a: DataFrame, b: DataFrame) -> DataFrame:
    """Elementwise max of two register frames with the same ``m`` —
    hll(A ∪ B) == merge(hll(A), hll(B)) EXACTLY (pinned in tests): the
    property that lets per-day/per-batch register frames roll up into
    any window's cardinality without re-reading data."""
    return a.unionByName(b).groupBy("bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(registers: DataFrame, m: int = 64) -> DataFrame:
    """Raw HyperLogLog estimator over a register frame → one row
    ``(est)``: ``E = alpha_m · m² / Σ_j 2^(−reg_j)``. The reciprocal sum
    is computed EXACTLY in BIGINT as ``S = Σ 2^(55 − reg)`` (reg ≤ 55 by
    the builder's sentinel, so every term is an integer shift and the sum
    is order-independent); the only floats are one fixed literal product
    and two divisions — the same IEEE op sequence in any engine. Raw
    estimator by contract (alpha = 0.709 for m = 64): no small-range
    linear-counting branch, because ln() is the one function engines
    disagree on at ulp level — callers in the < 2.5·m regime should count
    exactly instead (a distinct count that small needs no sketch).
    ``m`` validated like the builder (power of two >= 64); the m > 64
    branch uses the standard large-m alpha formula, which is the correct
    one for every admissible m in that branch (m >= 128)."""
    _check_hll_m(m)
    alpha_x1k = 709 if m == 64 else 7213 * 1000 // (10000 + 10790 // m)
    pow2_55 = float(1 << 55)
    return (
        registers.agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - reg)")).alias("_s")
        ).select(
            F.floor(
                F.lit(float(alpha_x1k))
                * F.lit(float(m * m))
                * F.lit(pow2_55)
                / F.col("_s").cast("double")
                / F.lit(1000.0)
            )
            .cast("long")
            .alias("est")
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """EXACT heavy hitters (keys with count ≥ threshold) via the classic
    two-pass sketch-then-verify plan: pass 1 builds the CMS (a
    constant-size frame, lazily checkpointed); pass 2 attaches each
    row's ``depth`` probe cells via BROADCAST joins — map-side, no
    shuffle of the fact rows — and only rows whose sketch estimate
    clears the threshold reach the exact groupBy.

    Correct by the CMS one-sided bound: estimates never undercount, so
    every true heavy key survives the filter (NO false negatives —
    result row-for-row equals the plain ``HAVING count ≥ t``, which is
    the q137 oracle); false positives are removed by the exact count.
    The value is the plan: on a zipf-tailed 100 TB key column the exact
    aggregate's reduce-side state drops from |key universe| to
    |candidate keys| — the long tail never reaches a reducer — while
    the plain groupBy allocates hash state for every distinct key.

    SIZE THE WIDTH: the filter only bites when the sketch's collision
    noise ``e·N/width`` sits well below ``threshold`` — an undersized
    sketch saturates and passes everything (measured in
    tools/scale_cms.py: width 256 at N=4M/t=2000 filters nothing; width
    16384 cuts the key state ~200×). Saturation degrades to the plain
    plan, never to a wrong answer. Broadcast joins (not literal-folding
    the cells into the plan) are what let width grow to millions of
    cells — a few MB broadcast, the same ceiling as any dimension
    broadcast.
    """
    from albedo_spark.io import widen

    # Only the key survives either pass — project it BEFORE the balance
    # shuffle so a wide fact row never crosses the exchange (guide
    # §2.3); both passes hash every row depth times, so balance the
    # scan once (build_cms's own widen is then a no-op).
    df = widen(df.select(key_col))
    sketch = build_cms(df, key_col, depth, width)
    key = F.col(key_col).cast("string")

    def bucket_r(r: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cms:{r}:"), key)), 1, 8), 16, 10
            ).cast("long")
            % width
        )

    if depth * width <= _CMS_ARRAY_CELLS_MAX:
        # Small/medium sketch (the common case): fold the whole grid
        # into ONE broadcast row holding a k = row·width+bucket ordered
        # cell array, and probe with pure element_at expressions — the
        # depth sequential broadcast-build jobs (one filtered slice per
        # row, each a driver round-trip) collapse into one build and
        # the probe stage regains whole-stage codegen with zero joins.
        # build_cms's grid guarantees every one of the depth×width
        # cells exists for ANY input, so the 1-based index r·width +
        # bucket + 1 is always in range. Measured ~2x on the gated
        # entry; byte-identical candidates either way.
        arr = (
            sketch.select(
                (F.col("row").cast("long") * width + F.col("bucket")).alias("k"),
                "cell",
            )
            .groupBy()
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "cell"))),
                    lambda s: s["cell"],
                ).alias("_cells")
            )
        )
        probed = df.crossJoin(F.broadcast(arr))
        est = F.least(
            *[
                F.element_at(
                    F.col("_cells"),
                    (F.lit(r * width) + bucket_r(r) + 1).cast("int"),
                )
                for r in range(depth)
            ]
        )
        candidates = probed.where(est >= threshold)
    else:
        # Million-cell sketches: the one-row array would funnel the
        # whole grid through a single aggregate task — keep the
        # per-row broadcast-join probes, whose build cost stays a few
        # MB per slice no matter the width (the docstring's scaling
        # argument). The sketch is shared by all depth builds via one
        # lazy checkpoint.
        sketch = sketch.localCheckpoint(eager=False)
        probed = df
        for r in range(depth):
            cells_r = sketch.where(F.col("row") == r).select(
                F.col("bucket").alias(f"_b{r}"), F.col("cell").alias(f"_c{r}")
            )
            probed = probed.withColumn(f"_b{r}", bucket_r(r)).join(
                F.broadcast(cells_r), f"_b{r}"
            )
        candidates = probed.where(
            F.least(*[F.col(f"_c{r}") for r in range(depth)]) >= threshold
        )
    return (
        candidates.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= threshold)
    )


def build_hll_by(
    df: DataFrame, group_col: str, key_col: str, m: int = 64
) -> DataFrame:
    """Per-group HyperLogLog registers → ``(group, bucket, reg)`` with
    exactly ``m`` rows PER GROUP (empty buckets zero-filled against the
    group's own grid) — ``build_hll`` lifted to a keyed sketch table:
    one register frame per language / domain / day, all mergeable by
    ``(group, bucket)`` max (``merge_hll_by``), so per-partition
    cardinalities roll up into any union of groups without re-reading
    data.

    Plan at 100 TB: identical to the global builder — one projection
    computing (bucket, rho) per row, ONE partial-aggregated shuffle
    whose reduce state is |groups| × m registers (constant per group,
    the whole point vs an exact |groups| × |keys| distinct). The
    zero-fill grid is distinct-groups × range(m): the group list is a
    by-product of the same aggregate, broadcast-scale relative to the
    fact table. Register math is the md5/bit_count chain of
    ``build_hll`` — engine-exact, the q136 gate discipline."""
    from albedo_spark.io import widen

    _check_hll_m(m)
    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), key)), 1, 15), 16, 10
    ).cast("long")
    sentinel = 1 << 54
    df = widen(df)  # per-row md5 register math — same balancing as build_cms
    rows = df.select(F.col(group_col).alias("grp"), h.alias("_h")).select(
        "grp",
        F.expr(f"_h % {m}").alias("bucket"),
        F.expr(
            f"bit_count((((_h div {m}) + {sentinel})"
            f" & -((_h div {m}) + {sentinel})) - 1) + 1"
        ).alias("rho"),
    )
    regs = rows.groupBy("grp", "bucket").agg(F.max("rho").alias("reg"))
    grid = (
        df.select(F.col(group_col).alias("grp"))
        .distinct()
        .crossJoin(
            df.sparkSession.range(m).select(F.col("id").alias("bucket"))
        )
    )
    return (
        grid.join(regs, ["grp", "bucket"], "left")
        .select(
            F.col("grp").alias(group_col),
            "bucket",
            F.coalesce(F.col("reg"), F.lit(0)).cast("int").alias("reg"),
        )
    )


def merge_hll_by(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Keyed register merge: elementwise max by (group, bucket) —
    hll(A ∪ B) == merge per group EXACTLY, same as the global
    ``merge_hll``. Groups absent from one side pass through (their grid
    rows exist only on the side that saw them)."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate_by(
    registers: DataFrame, group_col: str, m: int = 64
) -> DataFrame:
    """Per-group raw HLL estimate → ``(group, est)``: the
    ``hll_estimate`` BIGINT-exact reciprocal sum (``Σ 2^(55 − reg)``,
    order-independent) turned into one grouped aggregate — |groups|
    output rows from |groups| × m register rows, no data re-read. Same
    raw-estimator contract as the global function (no linear-counting
    branch; callers below ~2.5·m distincts per group should count
    exactly)."""
    _check_hll_m(m)
    alpha_x1k = 709 if m == 64 else 7213 * 1000 // (10000 + 10790 // m)
    pow2_55 = float(1 << 55)
    return (
        registers.groupBy(group_col)
        .agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - reg)")).alias("_s")
        )
        .select(
            group_col,
            F.floor(
                F.lit(float(alpha_x1k))
                * F.lit(float(m * m))
                * F.lit(pow2_55)
                / F.col("_s").cast("double")
                / F.lit(1000.0)
            )
            .cast("long")
            .alias("est"),
        )
    )


def build_histogram(
    df: DataFrame,
    value_col,
    boundaries: list[int],
    group_col: str | None = None,
) -> DataFrame:
    """Fixed-boundary counting histogram → ``(bucket, cnt)`` (or
    ``(group, bucket, cnt)``) with every bucket materialized, zeros
    included — the QUANTILE member of the sketch family (CMS =
    frequency, HLL = cardinality, Bloom = membership): len(boundaries)+1
    BIGINT cells regardless of input size, mergeable by elementwise SUM
    (``cnt`` adds across batches/days — the same positional-union
    contract as ``build_cms``), one partial-aggregated shuffle to build.

    ``value_col`` must already be an integer-valued Column (callers
    scale floats with the package's ``floor(x·10^k + 0.5)`` idiom so
    both engines bucket the identical integer). ``boundaries`` are
    literal UPPER bucket edges, strictly increasing: bucket b counts
    values v with boundaries[b-1] < v <= boundaries[b]; bucket
    len(boundaries) is the overflow cell (> last edge). Bucketing is
    ``size(filter(edges, e -> e < v))`` — a pure JVM higher-order
    expression over a literal array (no shuffle, no UDF), replayed
    verbatim by DuckDB ``len(list_filter(...))``.

    Exact-where-it-matters contract: the histogram is a SKETCH of the
    distribution (quantile error bounded by bucket width — you choose
    the resolution with the edge list), but its cells are EXACT counts,
    so the oracle hashes cell values, not a tolerance.

    NULL contract: rows with a NULL value — or, when grouped, a NULL
    group key — are EXCLUDED from the counts (a NULL has no bucket;
    silently folding it into bucket 0, as the pre-round-10 filter-size
    idiom did, miscounts the left tail, and a non-null-safe grid join
    would drop a NULL group's counts anyway). Callers wanting NULLs
    counted must impute first (the P9 idiom)."""
    edges = sorted(boundaries)
    assert list(boundaries) == edges and len(set(edges)) == len(edges), (
        "boundaries must be strictly increasing"
    )
    edges_arr = F.array(*[F.lit(int(e)).cast("long") for e in edges])
    v = value_col if not isinstance(value_col, str) else F.col(value_col)
    keys = ([group_col] if group_col else []) + ["bucket"]
    # Projection boundary BEFORE the HOF lambda: a computed value_col
    # captured inside filter() would re-evaluate once per edge (the q132
    # lesson) — materialize it as a plain column first.
    staged = df.select(
        *([group_col] if group_col else []), v.cast("long").alias("_v")
    ).where(
        F.col("_v").isNotNull()
        & (F.col(group_col).isNotNull() if group_col else F.lit(True))
    )
    rows = staged.select(
        *([group_col] if group_col else []),
        F.size(F.filter(edges_arr, lambda e: e < F.col("_v"))).alias("bucket"),
    )
    counts = rows.groupBy(*keys).agg(F.count("*").alias("cnt"))
    grid = df.sparkSession.range(len(edges) + 1).select(
        F.col("id").cast("int").alias("bucket")
    )
    if group_col:
        grid = (
            df.select(group_col)
            .where(F.col(group_col).isNotNull())
            .distinct()
            .crossJoin(grid)
        )
    return grid.join(counts, keys, "left").select(
        *keys, F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )


def histogram_quantiles(
    hist: DataFrame,
    boundaries: list[int],
    quantiles_x100: list[int],
    group_col: str | None = None,
) -> DataFrame:
    """Quantile estimates from a counting histogram → ``(q_x100, est)``
    (or ``(group, q_x100, est)``): for each requested percentile q the
    estimate is the UPPER EDGE of the first bucket whose cumulative
    count reaches rank ``ceil(q·N/100)`` — the standard histogram
    quantile read (estimate error ≤ one bucket width), all BIGINT
    (ranks via ``(N·q + 99) div 100``, edges are literals), so both
    engines agree bit-for-bit. Values past the last edge estimate as
    the last edge (the overflow bucket has no upper bound — size the
    edge list so the tail percentile you care about lands inside it).

    Plan: one window cumsum over ≤ |groups|·(|edges|+1) register rows +
    a tiny cross with the literal quantile list — nothing touches the
    source data, which is the point: p50/p90/p99 per group at 100 TB
    from a constant-size frame, vs percentile_approx's per-query full
    scan."""
    edges = sorted(boundaries)
    keys = [group_col] if group_col else []
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bucket") if keys else (
        Window.orderBy("bucket")
    )
    cum = hist.select(
        *keys,
        "bucket",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    edges_arr = F.array(*[F.lit(int(e)).cast("long") for e in edges])
    qs = hist.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles_x100], "q_x100 int"
    )
    ranked = cum.join(
        F.broadcast(qs),
        F.col("cum") >= F.expr("(n * q_x100 + 99) div 100"),
    )
    first = (
        ranked.groupBy(*keys, "q_x100")
        .agg(F.min("bucket").alias("_b"))
        .select(
            *keys,
            "q_x100",
            F.element_at(
                edges_arr, F.least(F.col("_b"), F.lit(len(edges) - 1)) + 1
            ).alias("est"),
        )
    )
    return first
