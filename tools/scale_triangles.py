"""Triangle-count scale probe: measures the two claims in
operators/graph.py triangle_count — wall grows ~linearly when edges grow
at CONSTANT average degree (the sum(outdeg^2) wedge term is then linear),
and a mega-hub is HARMLESS (degree-ordered orientation gives the hub no
out-wedges, so attaching a degree-H star costs ~nothing beyond its own
H edges).

    python tools/scale_triangles.py [n_nodes ...]   # default: 20000 80000

Graphs are deterministic pseudo-random (xxhash64-drawn endpoint pairs at
average degree ~10, generated in-engine with spark.range — no driver
data). For the first point the probe also re-runs with a hub of degree
n_nodes/2 attached to node 0.

One JSON line per point:
``{"n_nodes": ..., "n_edges": ..., "n_triangles": ..., "wall_sec": ...,
   "hub_degree": 0 | n/2}``

Reading it: wall_sec between the no-hub points should track n_edges
(~linear); the hub point should cost within noise of its no-hub sibling
despite one node touching half the graph.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _random_edges(spark, n_nodes: int, avg_degree: int) -> DataFrame:
    m = n_nodes * avg_degree // 2
    return spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit("a")), F.lit(n_nodes)).alias(
            "id_a"
        ),
        F.pmod(F.xxhash64(F.col("id"), F.lit("b")), F.lit(n_nodes)).alias(
            "id_b"
        ),
    )


def _probe(spark, edges: DataFrame, n_nodes: int, hub_degree: int) -> None:
    from albedo_spark.operators.graph import triangle_count

    edges = edges.persist()
    n_edges = edges.where(F.col("id_a") != F.col("id_b")).select(
        F.least("id_a", "id_b"), F.greatest("id_a", "id_b")
    ).distinct().count()
    t0 = time.perf_counter()
    total = (
        triangle_count(edges)
        .agg((F.sum("n_triangles") / 3).cast("long").alias("t"))
        .collect()[0]["t"]
    )
    wall = round(time.perf_counter() - t0, 3)
    edges.unpersist()
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "n_triangles": total,
                "wall_sec": wall,
                "hub_degree": hub_degree,
            }
        ),
        flush=True,
    )


def main() -> None:
    from albedo_spark.session import get_spark

    points = [int(a) for a in sys.argv[1:]] or [20_000, 80_000]

    spark = get_spark("scale-triangles")
    spark.sparkContext.setLogLevel("ERROR")

    for n_nodes in points:
        _probe(spark, _random_edges(spark, n_nodes, 10), n_nodes, 0)

    # hub stress: same graph as the first point + a star of degree n/2
    # on node 0 — the orientation must keep it from fanning out wedges
    n0 = points[0]
    hub = spark.range(1, n0 // 2 + 1).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    _probe(
        spark,
        _random_edges(spark, n0, 10).unionByName(hub),
        n0,
        n0 // 2,
    )


if __name__ == "__main__":
    main()
