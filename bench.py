"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is forced with a noop sink (full computation, no driver
transfer). Measurement is steady-state, JMH-style: one untimed warm-up
execution per query (amortizes whole-stage codegen compilation and JIT of
the generated classes — one-time costs that at sf0.1 dwarf the actual
data processing and that a long-running cluster pays once), then the
timed run. Headliners cover the perf-critical plan shapes: scan+agg (q1),
multi-join (q2), global top-k (q4), window top-k (q5), sessionization
(q17), windowed events agg (q15), MinHash LSH dedup (q21), brute-force
ANN (q23), as-of join (q27), LSH ANN (q33), six-table join (q51).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q2_market_segment_revenue",
    "q4_top_parts_by_revenue",
    "q5_top3_orders_per_customer",
    "q15_events_tumbling",
    "q17_sessionization",
    "q21_minhash_lsh_verified",
    "q23_cosine_knn",
    "q27_asof_join",
    "q33_ann_lsh",
    "q37_ann_ivf",
    "q38_salted_agg",
    "q39_time_rollup",
    "q40_running_revenue",
    "q45_time_range_join",
    "q51_local_supplier_volume",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from albedo_spark.queries import QUERIES
    from albedo_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + file listing with a trivial action.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        # untimed warm-up: compile/JIT the plan once (steady-state protocol)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
