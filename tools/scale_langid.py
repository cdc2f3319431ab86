"""langid throughput scaling: the q174 claim measured — per-doc work is
capped and the corpus never shuffles.

langid_chargram (operators/textstats.py) computes each document's
ranked gram profile WITHIN its row (O(L) char-zip gram chain, sorted
run-length counts, one struct sort) over the first ``head_chars``
characters, so total cost should scale LINEARLY in document count and
be INDEPENDENT of text beyond the cap. This probe fabricates
deterministic corpora of n docs x L chars (hash-derived letter soup
with language-like word structure) and sweeps both axes, reporting docs
per second.

Measured on this host (local[32], head_chars=300):

    n_docs   doc_len   wall     docs/s
    10000    400       3.5s     2893
    40000    400       3.7s     10755
    160000   400       11.1s    14425
    160000   4000      10.1s    15795

— throughput RISES toward its plateau as fixed task overhead amortizes
(10k -> 160k docs: 16x rows for 3.2x wall), then wall grows linearly,
and it is FLAT in document length past the cap (the 10x-longer-docs
row costs the same — the head_chars truncation is real). The per-doc
cost (~2 ms·core at the plateau) is interpreted-HOF bound,
embarrassingly parallel, and shuffle-free: at 100 TB the operator is
one map stage plus two tiny (doc,lang)-keyed aggregates over <= 64
rows/doc.

Usage::

    python tools/scale_langid.py [n_docs ...]   # default: 10000 40000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

WORDS = [
    "the", "of", "and", "to", "in", "der", "die", "und", "le", "la",
    "les", "el", "los", "que", "ist", "est", "es", "for", "with",
    "window", "table", "garden", "school", "morning", "letter",
]


def corpus(spark, n: int, doc_len: int):
    """Deterministic word-soup docs of ~doc_len chars: word i of doc d
    is WORDS[md5-derived index] — language-like trigram structure, no
    randomness, reproducible across runs."""
    words_per_doc = max(doc_len // 6, 1)
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in WORDS]),
            (
                F.abs(F.hash(F.concat(F.col("id").cast("string"), F.lit(":"), i)))
                % len(WORDS)
            ).cast("int")
            + 1,
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(arr, " ").alias("text"),
    )


def main() -> None:
    from albedo_spark.operators.textstats import langid_chargram
    from albedo_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 40_000]
    spark = get_spark("scale-langid")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    runs = [(n, 400) for n in sizes] + [(sizes[-1], 4000)]
    for n, doc_len in runs:
        docs = corpus(spark, n, doc_len).localCheckpoint()  # exclude gen cost
        out = langid_chargram(docs)
        out.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        langid_chargram(docs).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        rows.append(
            {
                "n_docs": n,
                "doc_len": doc_len,
                "wall_s": round(wall, 1),
                "docs_per_s": int(n / wall),
            }
        )
        print(json.dumps(rows[-1]))
        docs.unpersist()
    print(json.dumps({"metric": "langid_scaling", "rows": rows}))


if __name__ == "__main__":
    main()
