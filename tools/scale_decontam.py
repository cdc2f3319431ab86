"""Near-dup decontamination scaling (round 7's q118 operator).

Decorrelated replicas (scale_bench's perturbation — replica words share
no shingles with the base family) of the sf0.1 documents corpus against
a FIXED probe suite (the base corpus's doc_id < 25), through
``dedup_store.near_dup_decontaminate``:

    python tools/scale_decontam.py [n_copies ...]   # default: 1 10 50

One JSON line per point:
``{"n_docs": ..., "n_flagged": ..., "wall_sec": ...}``

The point of the shape: the flagged set must stay EXACTLY constant as
the corpus grows (only the unperturbed replica-0 family can near-dup
the probes — a flag appearing at a larger scale would be a correctness
bug, not a scale effect), while wall tracks the corpus-side banding
scan — the probe side is fixed-size at every point, exactly the
benchmark-suite-vs-100 TB-corpus geometry the operator is for.
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
    from albedo_spark.operators.dedup_store import near_dup_decontaminate
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 10, 50]

    spark = get_spark("scale-decontam")
    spark.sparkContext.setLogLevel("ERROR")
    base = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probes = base.where("doc_id < 25").select(
        F.col("doc_id").alias("probe_id"), "text"
    ).persist()
    probes.count()

    for n_copies in points:
        corpus = io.widen(replicate(base, n_copies)).persist()
        n_docs = corpus.count()
        t0 = time.perf_counter()
        flagged = near_dup_decontaminate(corpus, probes, threshold=0.8)
        n_flagged = flagged.select("doc_id").distinct().count()
        wall = round(time.perf_counter() - t0, 2)
        corpus.unpersist()
        print(json.dumps(
            {"n_docs": n_docs, "n_flagged": int(n_flagged), "wall_sec": wall}
        ))


if __name__ == "__main__":
    main()
