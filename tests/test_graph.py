"""PageRank (operators/graph.py): exact integer replay, personalized reset,
bipartite edge derivation, and the documented dangling-node contract."""

from collections import defaultdict

from albedo_spark.operators.graph import bipartite_edges, pagerank

EDGES = [
    (1, 2),
    (2, 1),
    (2, 3),
    (3, 1),
    (4, 1),
    (4, 3),
    (1, 9),  # 9 is dangling: in-edges only, never an src
]


def _replay(edges, iterations, seeds=None, damping=85, unit=10**9):
    """Pure-Python power iteration with the SAME BIGINT floor arithmetic;
    integer sums are order-independent so equality is exact, not approx."""
    outdeg: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    nodes = sorted(outdeg)
    reset_unit = unit * (100 - damping) // 100
    reset = {
        n: (reset_unit if seeds is None or n in seeds else 0) for n in nodes
    }
    rank = {n: unit for n in nodes}
    for _ in range(iterations):
        contrib: dict[int, int] = defaultdict(int)
        for s, d in edges:
            contrib[d] += (rank[s] * damping) // (outdeg[s] * 100)
        rank = {n: reset[n] + contrib.get(n, 0) for n in nodes}
    return rank


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_pagerank_matches_integer_replay(spark):
    got = {
        r.node: r.rank
        for r in pagerank(_edges_df(spark), iterations=4).collect()
    }
    assert got == _replay(EDGES, 4)


def test_pagerank_dangling_node_absent(spark):
    # Documented contract: mass flowing into a node with no out-edges is
    # dropped and the node never appears (feed a symmetrized edge set —
    # bipartite_edges — when every node must keep mass).
    got = {r.node for r in pagerank(_edges_df(spark), iterations=2).collect()}
    assert 9 not in got
    assert got == {1, 2, 3, 4}


def test_pagerank_personalized_seeds(spark):
    seeds_df = spark.createDataFrame([(2,)], "node long")
    got = {
        r.node: r.rank
        for r in pagerank(
            _edges_df(spark), iterations=4, seeds=seeds_df
        ).collect()
    }
    assert got == _replay(EDGES, 4, seeds={2})
    # The reset mass lands only on the seed: a node reachable solely via
    # the seed's neighborhood keeps rank; an isolated self-loop decays.
    assert got[2] > 0


def test_bipartite_edges_symmetric_and_collision_free(spark):
    pairs = spark.createDataFrame(
        [(10, 10), (10, 20), (30, 10), (30, 10)], "o long, p long"
    )
    edges = {(r.src, r.dst) for r in bipartite_edges(pairs, "o", "p").collect()}
    # duplicates collapse; both directions present; parity separates sides
    assert edges == {
        (20, 21), (21, 20),
        (20, 41), (41, 20),
        (60, 21), (21, 60),
    }
    for s, d in edges:
        assert (d, s) in edges
        assert s % 2 != d % 2  # left ids even, right ids odd — no collision


def test_pagerank_total_mass_conserved_on_symmetric_graph(spark):
    # On a symmetric (no-dangling) graph, per-round mass loss is only the
    # floor-division remainder: total stays within |edges| of the closed
    # form unit*N (each edge term floors away < 1 unit-billionth).
    pairs = spark.createDataFrame(
        [(i, i % 3) for i in range(9)], "o long, p long"
    )
    edges_df = bipartite_edges(pairs, "o", "p")
    n_edges = edges_df.count()
    ranks = pagerank(edges_df, iterations=6)
    rows = ranks.collect()
    total = sum(r.rank for r in rows)
    expected = 10**9 * len(rows)
    assert expected - n_edges * 6 <= total <= expected


def test_triangle_count_known_graph(spark):
    from albedo_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each node in 3), a pendant edge (4,5),
    # a triangle {6,7,8}, a star hub 100 with no closures, duplicate and
    # reversed edges that must collapse.
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5),
        (6, 7), (7, 8), (8, 6), (6, 8),  # reversed duplicate
        (100, 201), (100, 202), (100, 203), (201, 100),
        (9, 9),  # self-loop dropped
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_count_matches_brute_force(spark):
    from itertools import combinations

    from albedo_spark.operators.graph import triangle_count

    # pseudo-random graph, brute-force all node triples as the oracle
    nodes = list(range(24))
    edges = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if (a * 7919 + b * 104729) % 5 == 0
    ]
    es = {frozenset(e) for e in edges}
    expect: dict[int, int] = {}
    for t in combinations(nodes, 3):
        if all(frozenset(p) in es for p in combinations(t, 2)):
            for n in t:
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == expect


def test_k_core_known_graph(spark):
    from albedo_spark.operators.graph import k_core

    # K4 on {1,2,3,4} is a 3-core; a tail 4-5-6 hangs off it. Peeling is
    # simultaneous per round (degrees from BEFORE the round): round 1
    # drops 5 (deg 2) and 6 (deg 1) together, round 2 confirms K4 is
    # stable with all degrees exactly 3.
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),
        (2, 1),  # reversed duplicate must collapse
        (7, 7),  # self-loop dropped
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.degree for r in k_core(df, k=3, rounds=2).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_matches_python_peel(spark):
    from itertools import combinations

    from albedo_spark.operators.graph import k_core

    nodes = list(range(30))
    edges = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if (a * 7919 + b * 104729) % 4 == 0
    ]
    k, rounds = 4, 3
    # pure-Python simultaneous peel, exactly `rounds` rounds
    es = {frozenset(e) for e in edges}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for e in es:
            for n in e:
                deg[n] = deg.get(n, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {e for e in es if all(n in keep for n in e)}
    expect: dict[int, int] = {}
    for e in es:
        for n in e:
            expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.degree for r in k_core(df, k=k, rounds=rounds).collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _lpa_replay(sym_edges, rounds):
    """Pure-Python synchronous LPA with the same (count desc, label asc)
    winner rule — deterministic, so equality is exact."""
    nodes = sorted({s for s, _ in sym_edges})
    label = {n: n for n in nodes}
    for _ in range(rounds):
        votes: dict[int, dict[int, int]] = {}
        for s, d in sym_edges:
            votes.setdefault(d, {})[label[s]] = votes.setdefault(d, {}).get(label[s], 0) + 1
        label = {
            n: min(v.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for n, v in votes.items()
        }
    return label


def _symmetrize(pairs):
    return sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})


def test_label_propagation_matches_replay(spark):
    from albedo_spark.operators.graph import label_propagation

    # irregular graph: a hub, a chain, a triangle
    sym = _symmetrize(
        [(1, 2), (1, 3), (1, 4), (4, 5), (5, 6), (7, 8), (8, 9), (7, 9)]
    )
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert got == _lpa_replay(sym, 3)


def test_label_propagation_disjoint_cliques_converge_to_min_id(spark):
    from albedo_spark.operators.graph import label_propagation

    sym = _symmetrize([(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_personalized_pagerank_biases_toward_seeds(spark):
    """With the reset mass confined to seed nodes, the seed side of the
    graph must hold a strictly larger rank share than under uniform
    PageRank, and far-from-seed nodes must rank lower than they do
    globally (the random-walk-with-restart property q156 gates)."""
    from pyspark.sql import functions as F

    from albedo_spark.operators.graph import pagerank

    # two loosely-connected communities: 0-4 (seeded) and 10-14, one bridge
    pairs = (
        [(i, j) for i in range(5) for j in range(5) if i != j]
        + [(i, j) for i in range(10, 15) for j in range(10, 15) if i != j]
        + [(4, 10), (10, 4)]
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    seeds = spark.createDataFrame([(i,) for i in range(5)], "node long")

    def share(ranks_df):
        rows = {r.node: r.rank for r in ranks_df.collect()}
        seeded = sum(v for k, v in rows.items() if k < 5)
        return seeded / sum(rows.values())

    s_uniform = share(pagerank(edges, iterations=5))
    s_ppr = share(pagerank(edges, iterations=5, seeds=seeds))
    assert s_ppr > s_uniform
    assert s_ppr > 0.6  # most mass stays in the seeded community


def test_hits_hand_example(spark):
    """One HITS round on 1->3, 2->3, 2->4 is hand-checkable: node 3
    collects both hubs (auth pins at unit), node 4 half of one
    (500000); hub side then pins node 2 (it reaches both authorities)
    and gives node 1 floor(1e6*1e6/1.5e6) = 666666. Sources have auth 0
    and sinks hub 0 — the two-population contract."""
    from albedo_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {r.node: (r.auth, r.hub) for r in hits(edges, iterations=1).collect()}
    assert got == {
        1: (0, 666_666),
        2: (0, 1_000_000),
        3: (1_000_000, 0),
        4: (500_000, 0),
    }


def test_hits_headroom_tripwire(spark):
    # The ceiling derives from the caller's unit ((1<<63) div unit - 1),
    # so a near-int64 unit shrinks headroom to single digits and any
    # multi-hub raw sum must raise instead of wrapping.
    from albedo_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, 99) for i in range(5)], "src long, dst long"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="headroom"):
        graph.hits(edges, iterations=1, unit=(1 << 63) // 8).collect()


def test_hits_rejects_zero_iterations(spark):
    from albedo_spark.operators.graph import hits
    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)
