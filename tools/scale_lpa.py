"""Label-propagation scale probe: measures the claims in
operators/graph.py label_propagation — per-round cost FLAT across rounds
(eager localCheckpoint truncation, no lineage stacking) and roughly
linear in the edge count.

Runs LPA over the part-supplier bipartite graph of the sf dir's
lineitem (q129's graph), replicated N× with disjoint id spaces:

    python tools/scale_lpa.py [n_copies ...]   # default: 1 4

One JSON line per point:
``{"n_copies": ..., "n_edges": ..., "round_walls": [...], "wall_sec": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402


def _timed_lpa(edges: DataFrame, rounds: int) -> list[float]:
    """The operator's own loop, instrumented per round (same code shape
    as graph.label_propagation; inline so the probe times ROUND
    boundaries — the library function exposes no per-round hook)."""
    ed = edges.select(F.col("src").alias("_s"), F.col("dst").alias("_d")).persist()
    labels = (
        ed.select(F.col("_s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    walls = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        votes = (
            ed.join(labels.withColumnRenamed("node", "_s"), "_s")
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
            .localCheckpoint()
        )
        walls.append(round(time.perf_counter() - t0, 2))
    ed.unpersist()
    return walls


def main() -> None:
    from albedo_spark import io
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 4]

    spark = get_spark("scale-lpa")
    spark.sparkContext.setLogLevel("ERROR")
    li = io.load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")

    for n_copies in points:
        copies = spark.range(n_copies).select(F.col("id").alias("_r"))
        inc = (
            li.crossJoin(copies)
            .select(
                (F.col("l_partkey") * 2 + F.col("_r") * 10_000_000).alias("u"),
                (F.col("l_suppkey") * 2 + 1 + F.col("_r") * 10_000_000).alias("v"),
            )
            .distinct()
        )
        edges = inc.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            inc.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        ).persist()
        n_edges = edges.count()
        t0 = time.perf_counter()
        walls = _timed_lpa(edges, rounds=3)
        total = round(time.perf_counter() - t0, 2)
        edges.unpersist()
        print(
            json.dumps(
                {
                    "n_copies": n_copies,
                    "n_edges": n_edges,
                    "round_walls": walls,
                    "wall_sec": total,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
