"""Repeated-span dedup scaling (round 7's ExactSubstr-style operator).

Decorrelated replicas (scale_bench's perturbation — no span is shared
ACROSS replica families, so removals stay within-family and output
density is constant) of the sf0.1 documents corpus through
``remove_repeated_spans``:

    python tools/scale_spans.py [n_copies ...]   # default: 1 10 50

One JSON line per point:
``{"n_docs": ..., "n_removed": ..., "wall_sec": ...}``

Measured at round 7: 5k docs / 187,623 removed → 7.5 s; 50k / 1.876M →
8.9 s; 250k / 9.381M → 21.9 s — 50× corpus ≈ 2.9× wall, removals
exactly ×50.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_bench import replicate  # noqa: E402


def main() -> None:
    from albedo_spark import io
    from albedo_spark.operators.dedup import remove_repeated_spans
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 10, 50]

    spark = get_spark("scale-spans")
    spark.sparkContext.setLogLevel("ERROR")
    base = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for n_copies in points:
        corpus = io.widen(replicate(base, n_copies)).persist()
        n_docs = corpus.count()
        t0 = time.perf_counter()
        out = remove_repeated_spans(corpus, span_tokens=4, min_df=2)
        n_removed = out.agg(F.sum("n_removed")).collect()[0][0]
        wall = round(time.perf_counter() - t0, 2)
        corpus.unpersist()
        print(json.dumps(
            {"n_docs": n_docs, "n_removed": int(n_removed), "wall_sec": wall}
        ))


if __name__ == "__main__":
    main()
