"""Line-level boilerplate dedup scaling (round 6's C4 operator).

Decorrelated replicas (scale_bench's perturbation — no line is shared
ACROSS replica families, so boilerplate stays within-family and output
density is constant) of the sf0.1 documents corpus, re-lined into 3-word
lines exactly as q91 does, through ``line_boilerplate_dedup``:

    python tools/scale_line_dedup.py [n_copies ...]   # default: 1 10 100

One JSON line per point:
``{"n_docs": ..., "n_removed": ..., "wall_sec": ...}``
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
    from albedo_spark.operators.dedup import line_boilerplate_dedup
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    spark = get_spark("scale-line-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    base = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for n_copies in points:
        corpus = io.widen(replicate(base, n_copies)).select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(
                        F.lit(0), F.expr("(size(split(text, ' ')) - 1) div 3")
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.split(F.col("text"), " "), i * 3 + 1, 3)
                    ),
                ),
            ).alias("text"),
        ).persist()
        n_docs = corpus.count()
        t0 = time.perf_counter()
        out = line_boilerplate_dedup(corpus, min_df=2)
        n_removed = out.agg(F.sum("n_removed")).collect()[0][0]
        wall = round(time.perf_counter() - t0, 2)
        corpus.unpersist()
        print(json.dumps(
            {"n_docs": n_docs, "n_removed": int(n_removed), "wall_sec": wall}
        ))


if __name__ == "__main__":
    main()
