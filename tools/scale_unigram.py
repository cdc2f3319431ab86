"""Unigram-LM tokenizer scaling probe (q152/q155's operators): measures
the claim the module docstring makes — the ONLY corpus-sized pass is the
word-frequency groupBy; the piece grid, vocabulary, Viterbi DP, and
backtrack all run on |distinct words|-bounded frames, so wall-clock
should scale with the corpus pass and the per-doc join, NOT with the
DP machinery.

Decorrelated replicas of the sf0.01 documents (replica r gets a seeded
word-level suffix so the distinct-word vocabulary GROWS with replicas —
the honest mode: a constant vocab would make the claim trivially true):

    python tools/scale_unigram.py [replicas...]    # default 1 10 50

One JSON line per point: ``{"replicas": ..., "n_docs": ...,
"n_distinct_words": ..., "wall_doc_stats_sec": ...,
"wall_segment_sec": ...}``

Reading it: doc-stats wall should grow roughly with n_docs (the corpus
pass + stats join); the segment (per-word) wall with n_distinct_words
only. If either grows super-linearly the |vocab|-collapse design broke.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from albedo_spark.io import load_table
    from albedo_spark.operators.bpe import word_frequencies
    from albedo_spark.operators.unigram import (
        seed_vocab,
        unigram_doc_stats,
        viterbi_segment_words,
        vocab_costs,
        word_pieces,
    )
    from albedo_spark.session import get_spark

    points = [int(x) for x in sys.argv[1:]] or [1, 10, 50]

    spark = get_spark("scale-unigram")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    n_base = base.count()

    for reps in points:
        r = spark.range(reps).select(F.col("id").alias("r"))
        # decorrelate: replica r suffixes every word with a replica tag on
        # ~half the docs, so the distinct-word vocabulary grows with reps
        docs = (
            base.crossJoin(r)
            .select(
                (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
                F.when(
                    (F.col("doc_id") + F.col("r")) % 2 == 0,
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"(\w+)"),
                        F.concat(F.lit("$1x"), F.col("r").cast("string")),
                    ),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .localCheckpoint()
        )
        n_docs = docs.count()

        t0 = time.perf_counter()
        unigram_doc_stats(docs).write.format("noop").mode("overwrite").save()
        wall_stats = round(time.perf_counter() - t0, 3)

        words = word_frequencies(docs).localCheckpoint()
        n_words = words.count()
        vc = vocab_costs(seed_vocab(word_pieces(words, 4), 24))
        t0 = time.perf_counter()
        viterbi_segment_words(words, vc).write.format("noop").mode(
            "overwrite"
        ).save()
        wall_seg = round(time.perf_counter() - t0, 3)

        print(
            json.dumps(
                {
                    "replicas": reps,
                    "n_docs": n_docs,
                    "n_base_docs": n_base,
                    "n_distinct_words": n_words,
                    "wall_doc_stats_sec": wall_stats,
                    "wall_segment_sec": wall_seg,
                }
            )
        )


if __name__ == "__main__":
    main()
