"""Graph operators over plain edge DataFrames: PageRank (incl.
personalized), exact triangle counting, fixed-round k-core peel, and
synchronous label-propagation community detection.

The reference's own roadmap promises this surface and never shipped it —
``README.md:146`` ("Build a recommender system with Spark: PageRank and
GraphX") is the one TODO item left open in the reference repo. This module
closes it Spark-first: no GraphX (RDD-based, unavailable from PySpark
DataFrames), just the power iteration expressed as K rounds of
join + aggregate that Catalyst plans as ordinary shuffles.

Design for the oracle AND for 100 TB:

- **Integer arithmetic end-to-end.** Ranks are BIGINT multiples of
  ``unit`` (default 10^9); each round computes
  ``rank' = reset + Σ_in (rank_src * d_x100) div (outdeg_src * 100)``
  with integer floor division. Integer sums are order-independent, so
  Spark's shuffle order and DuckDB's aggregation order derive the SAME
  integers — the gated query (q121) hash-matches exactly, no float
  tolerance, the same discipline as ``textstats.bigram_lm_scores``.
- **Fixed iteration count, unrolled oracle.** A recursive CTE cannot
  aggregate in its recursive member (SQL rule; q63's fixpoint CTE gets
  away without one), so the oracle unrolls the K rounds as chained CTEs
  — which is also exactly what the Spark loop builds.
- **Per-round cost**: one shuffle join of edges against the rank frame
  (both hash-partitioned on the same key after round 1 — AQE reuses the
  exchange) + one aggregate. Hub skew is an AQE skew-join case; the
  edges frame is static across rounds and persisted once.
- **Dangling mass is dropped, not redistributed** (documented contract;
  the oracle replays the same choice via LEFT JOIN + coalesce 0). Feed
  a symmetrized edge set — e.g. ``bipartite_edges`` — when every node
  must keep mass, which is the recommender use anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bipartite_edges(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """Symmetric edge frame from distinct bipartite incidences.

    Node ids disambiguate the two partitions arithmetically —
    ``left*2`` vs ``right*2+1`` — so the two id spaces cannot collide
    and the mapping replays in any engine (no driver-side id dictionary,
    no monotonically_increasing_id nondeterminism). Each distinct
    (left, right) pair yields both directions, so every node has
    outdegree ≥ 1 and indegree ≥ 1: no dangling mass, no lost nodes.
    """
    inc = (
        pairs.select(
            (F.col(left_col).cast("long") * 2).alias("u"),
            (F.col(right_col).cast("long") * 2 + 1).alias("v"),
        )
        .distinct()
        # both union branches read inc: lazy-localCheckpoint so the
        # distinct's shuffle runs ONCE, not once per branch (the
        # dedup.py:622 no-leak materialization idiom)
        .localCheckpoint(eager=False)
    )
    return inc.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        inc.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    damping_x100: int = 85,
    unit: int = 10**9,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration PageRank → ``(node, rank)`` with BIGINT ranks.

    ``rank_0 = unit`` for every node with outdegree ≥ 1;
    ``rank_{t+1}(v) = reset(v) + Σ_{u→v} (rank_t(u) * damping) div
    (outdeg(u) * 100)`` — all BIGINT, all floor division, so the result
    is bit-identical across engines and shuffle orders. Un-normalized
    (ranks are ∝ the probability vector; ordering and ratios are what a
    recommender consumes).

    ``seeds``: optional one-column ``(node)`` frame → PERSONALIZED
    PageRank: the reset mass lands only on seed nodes (``reset(v) =
    unit*(100-damping)/100`` if v ∈ seeds else 0), giving ranks biased
    toward the seeds' neighborhoods — the "recommend around this user"
    form the reference's TODO meant. Seeds are broadcast (a seed set is
    small by definition).

    Scale: the edge frame (with outdegree attached) is persisted once
    and reused every round; each round's rank frame is eagerly
    ``localCheckpoint``-ed, truncating lineage exactly as
    ``dedup.connected_components`` does, so K rounds never stack K
    joins into one plan. The driver moves no data — the loop is pure
    plan construction + checkpoint actions.
    """
    # deg is consumed TWICE (the ed join below and the node/reset
    # frame): PERSIST, not checkpoint — the cache blocks fill once and
    # serve both consumers, and unlike a checkpoint (whose Scan
    # ExistingRDD reports UNKNOWN partitioning and stats) the persisted
    # frame keeps its groupBy(src) hashpartitioning visible to the
    # planner, which is what lets the ed build join and the node frame
    # skip their exchanges. Released in finally with ed/nodes_r.
    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg")).persist()
    # shuffle_hash, NOT the planner's default (r16): with deg persisted
    # its stats are exact while the rank side of the per-round join is a
    # stats-less checkpoint scan, so the planner "helpfully" broadcast
    # the EDGE side (66 MB at sf0.1 — re-collected to the driver once
    # per round, ~0.9 s each; at production width the same choice is an
    # 8 GB broadcast-cap error). The hint pins the hash join to build on
    # the per-node side, which co-partitions with ed's hash(src) layout
    # — zero exchange on the edge stream, at any scale.
    ed = edges.join(deg.hint("shuffle_hash"), src).persist()
    nodes = deg.select(F.col(src).alias("node"))
    reset_unit = (unit * (100 - damping_x100)) // 100
    if seeds is None:
        reset_col = F.lit(reset_unit).cast("long")
        nodes_r = nodes.withColumn("_reset", reset_col)
    else:
        seed_flag = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
        nodes_r = nodes.join(
            F.broadcast(seed_flag.withColumn("_is_seed", F.lit(1))), "node", "left"
        ).select(
            "node",
            F.when(F.col("_is_seed").isNotNull(), F.lit(reset_unit))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_reset"),
        )
    # PERSIST, not checkpoint (r16): nodes_r derives from deg's
    # groupBy(src), so it arrives hash-partitioned on node — exactly
    # what the per-round rank rejoin needs — and a checkpoint ERASED
    # that partitioning, re-shuffling the node frame once per round
    # (the HITS nodes-frame lesson, guide §2.4). Persist keeps the
    # partitioning visible to the planner; released in finally.
    nodes_r = nodes_r.persist()
    ranks = nodes_r.select("node", F.lit(unit).cast("long").alias("rank"))
    contrib_expr = F.expr(f"(rank * {damping_x100}) div (outdeg * 100)")
    try:
        # Inner rounds STACK FULLY LAZILY — no per-round checkpoint.
        # Each round is consumed exactly once by the next, so there is
        # nothing for a cache to dedupe, and a checkpoint boundary
        # ERASES the round's output partitioning: the next round then
        # re-shuffles the rank frame for the src join and the node
        # rejoin (3 exchanges/round). Stacked, hashpartitioning flows
        # alias-through — the src join aligns with the persisted edge
        # frame and the node rejoin reuses the aggregate's partitioning
        # — leaving ONE exchange per round (the dst sum). Measured
        # ~1.6x/3x on the gated entries. Every 8th round still
        # checkpoints lazily so a large ``iterations`` cannot grow the
        # plan unboundedly; the FINAL round is eager so everything has
        # materialized before ed is released below.
        # Both per-round joins carry a shuffle_hash hint on the per-node
        # side (r16): without it the planner's only sized side is the
        # persisted edge frame, which it BROADCASTS — re-collecting the
        # whole edge relation to the driver every round (measured ~0.9 s
        # × rounds at sf0.1, and a broadcast-cap hazard at scale). The
        # hinted build side is the |V|-row frame, already hash-partitioned
        # on the join key from the previous round's aggregate, so the
        # join is exchange-free on the edge stream and the only per-round
        # exchange left is the contribution sum's.
        for it in range(iterations):
            contrib = (
                ed.join(
                    ranks.withColumnRenamed("node", src).hint("shuffle_hash"),
                    src,
                )
                .select(F.col(dst).alias("node"), contrib_expr.alias("_c"))
                .groupBy("node")
                .agg(F.sum("_c").alias("_s"))
            )
            ranks = nodes_r.join(contrib.hint("shuffle_hash"), "node", "left").select(
                "node",
                (F.col("_reset") + F.coalesce(F.col("_s"), F.lit(0))).alias(
                    "rank"
                ),
            )
            if it == iterations - 1:
                ranks = ranks.localCheckpoint()
            elif (it + 1) % 8 == 0:
                ranks = ranks.localCheckpoint(eager=False)
    finally:
        # the final round's ranks frame is EAGERLY checkpointed (which
        # materializes every lazy inner round beneath it), so by the
        # time we get here nothing pending still reads ed or nodes_r —
        # releasing both unconditionally (a failed round must not strand
        # the caches, the dedup.py:516 discipline)
        ed.unpersist()
        nodes_r.unpersist()
        deg.unpersist()
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) →
    ``(node, label)`` community assignments after a FIXED number of
    rounds — the community-detection sibling of ``pagerank`` and the
    soft-clustering counterpart to ``dedup.connected_components`` (which
    gives exact transitive closure; LPA splits dense graphs into
    communities that components lump together).

    Contract (everything deterministic, every engine replays it):

    - Feed a SYMMETRIC edge frame (e.g. ``bipartite_edges``) — each
      node's votes come from its in-neighbors, so symmetry makes votes
      neighbor votes. Nodes appear iff they have an edge.
    - ``label_0(v) = v``; each round, ``label_{t+1}(v)`` = the label
      most frequent among v's in-neighbors, ties broken by SMALLEST
      label — (count desc, label asc) is a strict total order, so the
      synchronous update is reproducible (classic LPA breaks ties
      randomly; a gated operator cannot).
    - FIXED round count, like ``pagerank``/``k_core``: the oracle
      unrolls the rounds as chained CTEs; convergence detection would
      make the plan data-dependent.

    Per round: one shuffle join of the static persisted edge frame
    against the label frame, one (node, label) count, one per-node
    row_number — all integer, no floats anywhere. Rounds are eagerly
    localCheckpoint-ed so K rounds never stack K joins into one plan
    (the q63/q103/q121 iterative idiom). Hub vote-counting is a
    partial-aggregated shuffle (map-side combine), and AQE's skew join
    handles celebrity nodes on the join side.
    """
    # Pre-partitioned on the vote join's key (r16, the HITS/k-core
    # co-partition discipline): an unpartitioned persist made every
    # round re-shuffle the full edge frame; partitioned, each round
    # shuffles only the (node, label) frame.
    ed = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .repartition("_s")
        .persist()
    )
    labels = (
        ed.select(F.col("_s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    try:
        # Inner rounds stack fully lazily — the pagerank discipline:
        # each round is consumed exactly once by the next, and a
        # checkpoint boundary would erase the round's partitioning and
        # force the next vote join to re-shuffle the label frame; the
        # stacked plan lets the window's hashpartitioning(node) flow
        # alias-through into the next round's _s join against the
        # persisted edge frame. Every 8th round still checkpoints
        # lazily (plan-growth guard); the final round is eager so ed
        # has no pending reader when it is released below.
        # shuffle_hash on the label side (r16): the pre-partitioned
        # persisted edge frame is the only side with stats, so the
        # planner broadcast it per round (driver re-collect locally,
        # broadcast-cap error at scale); hinted, the |V|-row label frame
        # builds and the edge stream never moves.
        for it in range(rounds):
            votes = (
                ed.join(
                    labels.withColumnRenamed("node", "_s").hint("shuffle_hash"),
                    "_s",
                )
                .groupBy(F.col("_d").alias("node"), "label")
                .agg(F.count("*").alias("_cnt"))
            )
            w = Window.partitionBy("node").orderBy(
                F.col("_cnt").desc(), F.col("label").asc()
            )
            labels = (
                votes.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") == 1)
                .select("node", "label")
            )
            if it == rounds - 1:
                labels = labels.localCheckpoint()
            elif (it + 1) % 8 == 0:
                labels = labels.localCheckpoint(eager=False)
    finally:
        # the eager final round materialized every lazy inner round —
        # releasing unconditionally can strand no pending reader (the
        # pagerank/dedup.py:516 discipline)
        ed.unpersist()
    return labels


def triangle_count(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge frame →
    ``(node, n_triangles)`` — the clustering-coefficient numerator, the
    classic graph feature for fraud/spam/community signals the reference's
    dormant relation table (SURVEY §1.1, ``S/schemas/package.scala:56-62``)
    was collected for.

    Algorithm: degree-ordered orientation. Each undirected edge is
    directed from its lower endpoint to its higher endpoint under the
    TOTAL order (degree, id) — so every triangle has exactly one "apex"
    (its smallest vertex) and is found exactly once, and the join fan-out
    is bounded: max out-degree under this orientation is O(sqrt(|E|)),
    so the wedge join costs sum(outdeg^2) <= O(|E|^1.5) — the MapReduce
    triangle bound (Suri & Vassilvitskii's partition trick exists beyond
    it, but the orientation alone is what makes hub nodes harmless:
    a degree-10^6 celebrity node contributes NO wedges because almost
    every neighbor orders above it).

    The total order is compared as a (degree, id) STRUCT, never
    materialized as a global rank — a global row_number would funnel the
    node table through one partition (the anti-pattern
    ``packing.global_cumsum`` exists to avoid). Wedges (apex, b, c with
    b < c in the same order) are closed by one equi-join against the
    oriented edges. Everything is exact integers; any engine replays it.

    Three self-joins on node keys (degree attach, wedge, closure) — all
    AQE-planned hash shuffles; no iteration, no driver data. The three
    multiply-referenced frames (normalized edges ×3, oriented edges ×3,
    closed triangles ×3) are lazy-localCheckpointed — the package's
    no-leak materialization idiom (``dedup.py:622``) — because the
    caller's edge frame may hide an expensive derivation (q124's
    basket self-join) that AQE's exchange reuse does not reliably
    dedupe across nine references: measured at sf0.1, 57 s → ~3 s.
    """
    a, b = F.col(id_a), F.col(id_b)
    e = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("x"), F.greatest(a, b).alias("y")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionByName(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ex = e.join(deg.withColumnRenamed("node", "x"), "x").withColumnRenamed(
        "d", "dx"
    )
    exy = ex.join(deg.withColumnRenamed("node", "y"), "y").withColumnRenamed(
        "d", "dy"
    )
    lower_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    o = exy.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(lower_first, F.col("dy")).otherwise(F.col("dx")).alias("dv"),
    ).localCheckpoint(eager=False)
    o1 = o.select(
        F.col("u"), F.col("v").alias("b"), F.col("dv").alias("db")
    )
    o2 = o.select(
        F.col("u"), F.col("v").alias("c"), F.col("dv").alias("dc")
    )
    wedges = o1.join(o2, "u").where(
        F.struct(F.col("db"), F.col("b")) < F.struct(F.col("dc"), F.col("c"))
    )
    closed = (
        wedges.join(
            o.select(F.col("u").alias("b"), F.col("v").alias("c")),
            ["b", "c"],
        )
        .select("u", "b", "c")
        .localCheckpoint(eager=False)
    )
    members = (
        closed.select(F.col("u").alias("node"))
        .unionByName(closed.select(F.col("b").alias("node")))
        .unionByName(closed.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Fixed-round k-core peel over an undirected edge frame →
    ``(node, degree)`` of the subgraph surviving ``rounds`` rounds of
    "drop every node with degree < k" — the graph-curation workhorse
    (dense engagement cores vs. spam/singleton fringe; the k-core is the
    standard activity filter before co-occurrence/embedding stages, the
    same role the reference's minimum-stars thresholds play for its
    pipelines, ``S/UserRepoTransformer.scala``-adjacent curation).

    FIXED round count, not run-to-convergence: each round is
    deterministic given the previous round's graph (integer degrees, no
    ordering sensitivity), so an unrolled-CTE oracle replays the exact
    peel — the q121 pagerank discipline. The true k-core is the fixpoint;
    ``rounds`` rounds give the standard over-approximation that shrinks
    monotonically toward it (at web scale a handful of rounds removes
    almost all of the fringe — each pass peels the entire current
    boundary, not one node).

    Per round: one degree aggregate + two semi-joins (both endpoints must
    survive) — all key-partitioned shuffles Catalyst plans freely; the
    round output is eagerly ``localCheckpoint``-ed so R rounds never
    stack R join-trees into one plan and each round's THREE references
    to the current edge frame (degree, src-semi, dst-semi) read
    materialized blocks. The driver moves no data.
    """
    a, b = F.col(id_a), F.col(id_b)
    half = (
        edges.where(a != b)
        .select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .distinct()
        # read by both union branches — materialize the distinct once
        .localCheckpoint(eager=False)
    )
    e = (
        half.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionByName(half.select(F.col("y").alias("src"), F.col("x").alias("dst")))
        .localCheckpoint(eager=False)
    )
    # Rounds checkpoint lazily (the pagerank discipline): lineage still
    # truncates per round at materialization — each round's THREE reads
    # of the current e hit cached blocks — but the whole peel runs as
    # one job under the caller's action instead of R driver round-trips.
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count("*").alias("_d"))
        keep = deg.where(F.col("_d") >= k).select("src")
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    unit: int = 10**6,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999 — public algorithm) →
    ``(node, auth, hub)`` with exact-BIGINT scores: the mutually
    recursive pair PageRank cannot express — a node is a good HUB if it
    points at good authorities, a good AUTHORITY if good hubs point at
    it (on a directed graph the two sides are different populations;
    PageRank's single score conflates them).

    Integer normalization replaces the paper's L2 norm: after each
    half-step the raw sums rescale to ``raw · unit div max(raw)`` — the
    max is a one-row lazy aggregate riding a broadcast cross join (the
    fully-lazy scalar idiom), floor division keeps every score a BIGINT
    both engines replay, and the fixed point is the same (scores are
    ratio-meaningful; the max node pins at ``unit``). A lazy
    ``raise_error`` tripwire rejects raw sums past the int64 rescale
    headroom.

    Scale: the edge frame persists once and serves BOTH half-steps;
    each half-step is ONE shuffle join + one partial-agg sum, and every
    rescaled frame is eagerly localCheckpoint-ed so 2·K rounds never
    stack into one plan (the q121 iterative idiom). Hub skew is AQE's
    skew-join case.
    """
    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    # Rescale multiplies raw sums by the caller's unit, so the int64
    # headroom guard must be computed from THAT unit — a fixed ceiling
    # sized for the default would let larger units wrap undetected.
    ceil = (1 << 63) // unit - 1
    ed = edges.select(src, dst)
    # TWO persisted copies, each PRE-PARTITIONED on its half-step's join
    # key (guide §2.4: operations keyed the same way share one
    # exchange): the auth half-step joins on src, the hub half-step on
    # dst, and a single unpartitioned persist made every one of the 2·K
    # half-steps re-shuffle the full edge frame. Persist (not
    # localCheckpoint) keeps the output partitioning visible to the
    # planner, so each half-step shuffles only the (node, score) frame.
    ed_src = ed.repartition(F.col(src)).persist()
    # derived from the PERSISTED copy, not the raw input: the caller's
    # edge frame usually ends in its own shuffle (a distinct), and two
    # independent persists would execute that subtree once each.
    ed_dst = ed_src.repartition(F.col(dst)).persist()
    nodes = (
        ed_src.select(F.col(src).alias("node"))
        .unionByName(ed_src.select(F.col(dst).alias("node")))
        .distinct()
        # persist, not localCheckpoint: distinct() leaves the frame
        # hash-partitioned on node — exactly what the per-half-step
        # rescale join and the final result join require — and a
        # checkpoint would erase that partitioning (the pagerank
        # stacking lesson), re-shuffling nodes once per half-step.
        .persist()
    )

    def _rescale(raw: DataFrame) -> DataFrame:
        guarded = raw.select(
            "node",
            F.when(
                F.col("_s") > F.lit(ceil),
                F.raise_error(
                    F.concat(
                        F.lit("hits: raw score "),
                        F.col("_s").cast("string"),
                        F.lit(
                            f" exceeds the rescale BIGINT headroom"
                            f" {ceil}; lower unit or shard"
                        ),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("_s"))
            .alias("_s"),
        )
        # guarded is consumed TWICE (the one-row max build and the
        # rescale join) and holds the whole half-step join+sum subtree —
        # without a boundary each half-step executed twice, once inside
        # the broadcast build and once for the join. One lazy
        # localCheckpoint runs it once (measured ~2.5x on q166, and it
        # removes the duplicated edge-frame shuffle at any scale).
        guarded = guarded.localCheckpoint(eager=False)
        m = guarded.agg(F.max("_s").alias("_m"))
        return (
            # shuffle_hash (r16): the checkpointed half-step frame is
            # stat-less, so the planner broadcast it (a |V|-row driver
            # collect per half-step locally; a broadcast-cap error at
            # scale). Hinted, it shuffles hash(node) — co-partitioned
            # with the persisted nodes frame.
            nodes.join(guarded.hint("shuffle_hash"), "node", "left")
            .crossJoin(F.broadcast(m))
            .select(
                "node",
                F.coalesce(
                    F.expr(f"(_s * {unit}L) div _m"), F.lit(0)
                ).alias("score"),
            )
        )

    hub = nodes.select("node", F.lit(unit).cast("long").alias("score"))
    auth = None
    try:
        # Half-steps checkpoint lazily, the LAST one eagerly — the
        # pagerank discipline (one job for all 2·K half-steps, lineage
        # still truncated, ed safely releasable below).
        # Half-step joins hint shuffle_hash on the score side (r16): the
        # persisted edge copies are the only side the planner can size,
        # so it BROADCAST them — re-collecting the full edge relation to
        # the driver once per half-step (~0.3 s × 2·K at sf0.1, a
        # broadcast-cap error at production width). Hinted, the build
        # side is the |V|-row score frame, co-partitioned with the
        # pre-partitioned edge copy — no edge movement at all.
        for it in range(iterations):
            araw = (
                ed_src.join(
                    hub.withColumnRenamed("node", src).hint("shuffle_hash"), src
                )
                .select(F.col(dst).alias("node"), F.col("score").alias("_c"))
                .groupBy("node")
                .agg(F.sum("_c").alias("_s"))
            )
            auth = _rescale(araw).localCheckpoint(eager=False)
            hraw = (
                ed_dst.join(
                    auth.withColumnRenamed("node", dst).hint("shuffle_hash"), dst
                )
                .select(F.col(src).alias("node"), F.col("score").alias("_c"))
                .groupBy("node")
                .agg(F.sum("_c").alias("_s"))
            )
            hub = _rescale(hraw).localCheckpoint(eager=(it == iterations - 1))
    finally:
        ed_src.unpersist()
        ed_dst.unpersist()
    return nodes.join(
        auth.select("node", F.col("score").alias("auth")).hint("shuffle_hash"),
        "node",
        "left",
    ).join(
        hub.select("node", F.col("score").alias("hub")).hint("shuffle_hash"),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce("auth", F.lit(0)).alias("auth"),
        F.coalesce("hub", F.lit(0)).alias("hub"),
    )
