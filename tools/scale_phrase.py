"""Phrase-matcher keying probe (q157's operator): measures the claim the
``phrase_match(key="rarest")`` docstring makes — posting each phrase on
its rarest corpus token cuts the candidate set vs first-token keying
when phrases lead with stopwords (the common blocklist shape: "of the
...", "in a ...").

Synthetic stopword-heavy corpus: every doc is a run of high-frequency
filler ("the of and a in") with rare payload words sprinkled in; the
dictionary is phrases that LEAD with a stopword and end with a rare
payload word.

    python tools/scale_phrase.py [n_docs] [doc_len]    # default 5000 60

One JSON line: ``{"n_docs": ..., "candidates_first": ...,
"candidates_rarest": ..., "ratio": ..., "matches_equal": true}``

Reading it: candidates_* counts the posting-join output BEFORE the
slice verify (the row volume the verify join must carry); ratio is the
rarest-keying cut. matches_equal re-asserts the pytest equivalence on
this corpus.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

STOP = ["the", "of", "and", "a", "in"]


def main() -> None:
    from albedo_spark.operators.retrieval import phrase_match
    from albedo_spark.operators.textstats import tokens
    from albedo_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    spark = get_spark("scale-phrase")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(doc_len - 1)),
                lambda i: F.when(
                    (F.col("id") + i) % 9 == 0,
                    F.concat(F.lit("payload"), ((F.col("id") * 7 + i) % 200).cast("string")),
                ).otherwise(
                    F.element_at(
                        F.array(*[F.lit(s) for s in STOP]),
                        ((F.col("id") + i) % 5 + 1).cast("int"),
                    )
                ),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint()

    phrases = spark.createDataFrame(
        [(i, ["the", "of", f"payload{i}"]) for i in range(20)],
        "phrase_id long, pt array<string>",
    )

    # candidate counts = posting-join rows before the verify
    toks = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    pos_toks = toks.select("doc_id", F.posexplode("w").alias("pos", "tok"))
    first_keys = phrases.select(F.element_at("pt", 1).alias("tok"))
    cand_first = pos_toks.join(F.broadcast(first_keys), "tok").count()
    # rarest key per phrase = the payload token by construction
    rare_keys = phrases.select(F.element_at("pt", 3).alias("tok"))
    cand_rarest = pos_toks.join(F.broadcast(rare_keys), "tok").count()

    a = {tuple(r) for r in phrase_match(docs, phrases, key="first").collect()}
    b = {tuple(r) for r in phrase_match(docs, phrases, key="rarest").collect()}

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "doc_len": doc_len,
                "candidates_first": cand_first,
                "candidates_rarest": cand_rarest,
                "ratio": round(cand_first / max(cand_rarest, 1), 1),
                "n_matches": len(a),
                "matches_equal": a == b,
            }
        )
    )


if __name__ == "__main__":
    main()
