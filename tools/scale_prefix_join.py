"""Prefix-filtering similarity-join scaling (round 8's q128 operator).

Decorrelated replicas of the sf0.1 documents corpus through BOTH exact
Jaccard joins at the same threshold (7/10, 3-shingles):

- ``prefix_filter_jaccard_pairs`` — candidates = pairs sharing a shingle
  in both df-ordered PREFIXES (complete by theorem);
- ``ngram_jaccard_pairs``-style brute inverted-index join — candidates =
  pairs sharing ANY shingle.

    python tools/scale_prefix_join.py [n_copies ...]   # default: 1 5 15

One JSON line per point: ``{"n_docs": ..., "pairs": ..., "cand_prefix":
..., "cand_brute": ..., "wall_prefix_sec": ..., "wall_brute_sec": ...}``

The claims measured: (1) the two joins return the SAME pair set at every
scale (the probe asserts it — completeness is the operator's contract);
(2) the prefix join's candidate-pair count is a small fraction of the
brute join's co-occurring-pair count, and the gap is what the operator
buys at 100 TB where the brute join's stop-shingle df² term dominates.
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
    from albedo_spark.operators.dedup import (
        normalize_text,
        prefix_filter_jaccard_pairs,
        shingles_from_words,
    )
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = [int(a) for a in sys.argv[1:]] or [1, 5, 15]

    spark = get_spark("scale-prefix-join")
    spark.sparkContext.setLogLevel("ERROR")
    base = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for n_copies in points:
        corpus = io.widen(replicate(base, n_copies)).persist()
        n_docs = corpus.count()

        t0 = time.perf_counter()
        prefix_pairs = {
            (r.id_a, r.id_b)
            for r in prefix_filter_jaccard_pairs(
                corpus, shingle_n=3, threshold_num=7, threshold_den=10
            ).collect()
        }
        wall_prefix = round(time.perf_counter() - t0, 2)

        # brute inverted-index join (the q128-oracle shape): exact
        # intersections over ALL co-occurring pairs, then the threshold —
        # on the SAME 60-bit hashed shingles the operator uses
        words = corpus.select(
            "doc_id", F.split(normalize_text(F.col("text")), " ").alias("_w")
        )
        hashed = F.array_distinct(
            F.transform(
                shingles_from_words(F.col("_w"), 3),
                lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long"),
            )
        )
        sh = words.select(
            "doc_id", F.explode(hashed).alias("sh")
        ).localCheckpoint(eager=False)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("s"))
        t0 = time.perf_counter()
        inter = (
            sh.alias("a")
            .join(
                sh.alias("b"),
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
            .agg(F.count("*").alias("inter"))
            .localCheckpoint(eager=False)
        )
        cand_brute = inter.count()
        brute_pairs = {
            (r.id_a, r.id_b)
            for r in inter.join(
                sizes.select(F.col("doc_id").alias("id_a"), F.col("s").alias("s_a")),
                "id_a",
            )
            .join(
                sizes.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b")),
                "id_b",
            )
            .where(
                F.col("inter") * 10 >= 7 * (F.col("s_a") + F.col("s_b") - F.col("inter"))
            )
            .collect()
        }
        wall_brute = round(time.perf_counter() - t0, 2)

        assert prefix_pairs == brute_pairs, (
            f"completeness violated at {n_copies}x: "
            f"{len(prefix_pairs)} vs {len(brute_pairs)}"
        )

        # candidate surface of the prefix join: distinct pairs sharing a
        # PREFIX shingle (re-derived the way the operator builds them)
        dfreq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
        pref = (
            sh.join(dfreq, "sh")
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("_df", "sh"))).alias("_o"))
            .select(
                "doc_id",
                F.transform("_o", lambda s: s["sh"]).alias("shset"),
                F.size("_o").alias("s"),
            )
            .withColumn("p", F.col("s") - F.expr("(7*s + 9) div 10") + F.lit(1))
            .select(
                "doc_id", F.explode(F.slice("shset", F.lit(1), F.col("p"))).alias("sh")
            )
        )
        cand_prefix = (
            pref.alias("a")
            .join(
                pref.alias("b"),
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )
        corpus.unpersist()
        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "pairs": len(prefix_pairs),
                    "cand_prefix": int(cand_prefix),
                    "cand_brute": int(cand_brute),
                    "wall_prefix_sec": wall_prefix,
                    "wall_brute_sec": wall_brute,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
