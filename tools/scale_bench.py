"""Dedup scaling curve: MinHash-LSH + exact-Jaccard verify (the q21
pipeline, identical params) over replicated-and-perturbed copies of the
sf0.1 documents corpus.

Replication alone would make every replica a near-dup of its siblings and
the OUTPUT (pairs) would grow quadratically in the copy count, drowning
the number we care about — candidate-generation cost. So replicas > 0 are
decorrelated: EVERY word gets a per-replica suffix, so no shingle (and no
band key) is shared across replicas, while replica 0 keeps the base corpus
(and its planted near-dups) bit-identical and each replica family keeps
the same within-family near-dup structure. Corpus grows N×, near-dup
density stays constant — the realistic growth mode for a crawl. (A
partial perturbation — every 7th word — leaves ~32% of band keys shared
across replicas and candidate generation goes quadratic in the copy
count: a useful adversarial data point, but a different experiment.)

Usage::

    python tools/scale_bench.py [n_copies ...]      # default: 1 10 100

Prints one JSON line per point:
``{"n_docs": ..., "n_pairs": ..., "wall_sec": ...}``

Evidence recorded in ARCHITECTURE.md ("Scale design" section). Earlier
curve points (round 1, plain replication, sf0.01 base): 5k docs 2.3 s /
50k 6.8 s / 150k 16.0 s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def replicate(docs, n_copies: int):
    if n_copies == 1:
        return docs
    # long, not int: replica * 10M overflows int32 past ~214 copies (ANSI
    # mode rightly refuses to wrap)
    copies = docs.sparkSession.range(n_copies).select(
        F.col("id").cast("long").alias("_replica")
    )
    words = F.split(F.col("text"), " ")
    perturbed = F.array_join(
        F.transform(
            words,
            lambda w: F.when(
                F.col("_replica") > 0,
                F.concat(w, F.lit("_r"), F.col("_replica")),
            ).otherwise(w),
        ),
        " ",
    )
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_replica") * F.lit(10_000_000).cast("long")).alias(
                "doc_id"
            ),
            perturbed.alias("text"),
            "_replica",
        )
        .drop("_replica")
    )


def main() -> None:
    from albedo_spark import io
    from albedo_spark.operators.dedup import jaccard_verify, minhash_lsh_pairs
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    spark = get_spark("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for n_copies in points:
        corpus = io.widen(replicate(base, n_copies))
        n_docs = corpus.count()  # materialize the input outside the timing
        corpus = corpus.persist()
        corpus.count()
        t0 = time.perf_counter()
        cand = minhash_lsh_pairs(
            corpus, num_hashes=8, rows_per_band=2, shingle_n=3, max_bucket=200
        )
        n_pairs = jaccard_verify(cand, corpus, shingle_n=3, threshold=0.8).count()
        wall = round(time.perf_counter() - t0, 2)
        corpus.unpersist()
        print(json.dumps({"n_docs": n_docs, "n_pairs": n_pairs, "wall_sec": wall}))


if __name__ == "__main__":
    main()
