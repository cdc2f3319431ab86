"""PageRank scale probe: measures the claim in operators/graph.py that
per-round cost is CONSTANT across rounds (localCheckpoint truncation —
no lineage stacking) and roughly linear in the edge count.

Runs pagerank over the order-part bipartite graph of the sf dir's
lineitem, replicated N× with disjoint id spaces (edge count scales N×,
structure unchanged), and reports per-round walls:

    python tools/scale_pagerank.py [n_copies ...]   # default: 1 4

One JSON line per point:
``{"n_copies": ..., "n_edges": ..., "round_walls": [...], "wall_sec": ...}``

Reading it: round_walls should be FLAT (rounds 2..K within noise of round
1 — lineage is truncated) and wall_sec should grow ~linearly with
n_edges (each round is one equi-join + one aggregate over the edge
frame, nothing super-linear).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _timed_pagerank(edges: DataFrame, iterations: int) -> list[float]:
    """The operator's own loop, instrumented per round (same code shape as
    graph.pagerank; kept inline so the probe times ROUND boundaries —
    the library function exposes no per-round hook by design)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "src").persist()
    nodes = deg.select(F.col("src").alias("node"))
    nodes_r = nodes.withColumn(
        "_reset", F.lit(150_000_000).cast("long")
    ).localCheckpoint()
    ranks = nodes_r.select("node", F.lit(10**9).cast("long").alias("rank"))
    contrib_expr = F.expr("(rank * 85) div (outdeg * 100)")
    walls = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), contrib_expr.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes_r.join(contrib, "node", "left")
            .select(
                "node",
                (F.col("_reset") + F.coalesce(F.col("_s"), F.lit(0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
        walls.append(round(time.perf_counter() - t0, 3))
    ed.unpersist()
    return walls


def main() -> None:
    from albedo_spark import io
    from albedo_spark.operators.graph import bipartite_edges
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 4]

    spark = get_spark("scale-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    li = io.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )

    for n_copies in points:
        # disjoint id spaces per replica: same structure, N x edges
        shifted = None
        for i in range(n_copies):
            rep = li.select(
                (F.col("l_orderkey") + F.lit(i * 10_000_000)).alias(
                    "l_orderkey"
                ),
                (F.col("l_partkey") + F.lit(i * 10_000_000)).alias(
                    "l_partkey"
                ),
            )
            shifted = rep if shifted is None else shifted.unionByName(rep)
        edges = bipartite_edges(shifted, "l_orderkey", "l_partkey").persist()
        n_edges = edges.count()
        t0 = time.perf_counter()
        walls = _timed_pagerank(edges, iterations=5)
        wall = round(time.perf_counter() - t0, 3)
        edges.unpersist()
        print(
            json.dumps(
                {
                    "n_copies": n_copies,
                    "n_edges": n_edges,
                    "round_walls": walls,
                    "wall_sec": wall,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
