"""Sketch-then-verify heavy-hitter probe (q137's operator): measures the
claim that the CMS candidate filter keeps the long tail out of the exact
aggregate on a zipf-tailed key column.

Synthetic zipf-ish keys (key k drawn with weight ∝ 1/rank via an
md5-deterministic draw), n_rows scaled by argv:

    python tools/scale_cms.py [n_rows] [threshold]   # default 4000000 2000

One JSON line: ``{"n_rows": ..., "n_distinct": ..., "threshold": ...,
"candidate_rows": ..., "candidate_keys": ..., "key_state_frac": ...,
"heavy_keys": ...,
"wall_plain_sec": ..., "wall_sketch_sec": ...}``

Reading it: in a zipf stream most ROWS belong to heavy keys — rows that
must be counted either way — so the operator's reduction shows up in
DISTINCT KEYS reaching the aggregate (candidate_keys vs n_distinct):
that is the reduce-side hash state the plain HAVING plan allocates for
the whole key universe, the thing that doesn't fit memory at 10^9+
distinct keys. Wall at local[32] toy scale favors the plain plan (one
scan vs two); the key-state ratio is what survives extrapolation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from albedo_spark.operators.sketches import build_cms, cms_heavy_hitters
    from albedo_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    spark = get_spark("scale-cms")
    spark.sparkContext.setLogLevel("ERROR")
    # 80% of rows on 100 heavy keys, 20% spread over a ~million-key tail
    fact = spark.range(n_rows).select(
        F.when(F.expr("id % 5 < 4"), F.expr("id % 100"))
        .otherwise(F.expr("100 + (id div 5) % 1000000"))
        .alias("k")
    ).persist()
    n = fact.count()
    n_distinct = fact.select("k").distinct().count()

    t0 = time.perf_counter()
    plain = {
        (r.k, r.n)
        for r in fact.groupBy("k")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= threshold)
        .collect()
    }
    wall_plain = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sketch = {
        (r.k, r.n)
        for r in cms_heavy_hitters(fact, "k", threshold, depth=4, width=16384).collect()
    }
    wall_sketch = round(time.perf_counter() - t0, 2)
    assert sketch == plain, (len(sketch), len(plain))

    # candidate surface: rows/keys surviving the map-side sketch filter
    # (the operator's own broadcast-probe shape, re-derived)
    sk = build_cms(fact, "k", 4, 16384)
    key = F.col("k").cast("string")
    probed = fact
    for r in range(4):
        bucket_r = (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"cms:{r}:"), key)), 1, 8), 16, 10)
            .cast("long") % 16384
        )
        cells_r = sk.where(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("cell").alias(f"_c{r}")
        )
        probed = probed.withColumn(f"_b{r}", bucket_r).join(F.broadcast(cells_r), f"_b{r}")
    cand = probed.where(F.least(*[F.col(f"_c{r}") for r in range(4)]) >= threshold).persist()
    cand_rows = cand.count()
    cand_keys = cand.select("k").distinct().count()
    cand.unpersist()
    fact.unpersist()
    print(
        json.dumps(
            {
                "n_rows": n,
                "n_distinct": n_distinct,
                "threshold": threshold,
                "heavy_keys": len(plain),
                "candidate_rows": cand_rows,
                "candidate_keys": cand_keys,
                "key_state_frac": round(cand_keys / n_distinct, 6),
                "wall_plain_sec": wall_plain,
                "wall_sketch_sec": wall_sketch,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
