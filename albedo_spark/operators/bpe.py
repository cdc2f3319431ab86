"""Distributed byte-pair-encoding statistics (no reference twin — LLM
tokenizer-training surface, same extension family as textstats/packing).

BPE training is an iterative loop: count adjacent symbol pairs across the
corpus (weighted by word frequency), merge the most frequent pair, repeat.
The expensive, data-parallel part is the PAIR COUNT — the merge decision
is a driver-side argmax over a tiny aggregate. This module implements one
exact pair-count step as pure DataFrame expressions:

1. word frequencies: one groupBy over the tokenized corpus — after which
   data volume is |vocab|, not |corpus| (the classic BPE optimization:
   count pairs per distinct word once, weight by frequency),
2. each word explodes into its adjacent character pairs (higher-order
   array functions, JVM-side, no Python),
3. one groupBy pair → weighted count.

Two shuffles total, both on keys that shrink the data (vocab, then pair
vocabulary). At 100 TB the vocab aggregate is the only pass over the raw
corpus; iterating merges re-processes just the |vocab|-sized frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.textstats import tokens


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the normalized whitespace tokenization."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """One BPE statistics step: adjacent character-pair counts weighted by
    word frequency. ``words`` carries (word, freq); symbols are the word's
    characters (the iteration-0 alphabet — after a merge, re-segmented
    words would flow through the same expression unchanged).
    """
    chars = F.split(F.col("word"), "")
    pairs = F.transform(
        F.sequence(F.lit(0), F.length("word") - 2),
        lambda i: F.concat(
            F.element_at(chars, i + 1), F.element_at(chars, i + 2)
        ),
    )
    return (
        words.where(F.length("word") >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def top_pairs(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """The k most frequent adjacent pairs (deterministic tiebreak on the
    pair itself) — the candidate merges of BPE iteration 0."""
    pc = pair_counts(word_frequencies(docs, text_col))
    return (
        pc.orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def learn_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus (Sennrich et al.
    2016): the full iterative trainer on top of the one-step statistics
    above. Returns the merge list ``[(left, right, weighted_count), …]``
    in learned order — the artifact a tokenizer ships.

    Iteration discipline (the connected-components/ALS precedent for
    driver loops): the corpus collapses to the |vocab|-sized
    ``(symbols array, freq)`` frame ONCE; each round explodes adjacent
    symbol pairs, one weighted count aggregate finds the argmax — count
    desc, then (left, right) lexicographic, so ties are deterministic —
    and exactly ONE small row reaches the driver; the winning pair folds
    into every word's symbol array with a greedy left-to-right HOF
    aggregate (standard BPE non-overlapping replacement: 'aaa' + (a,a)
    → [aa, a]); ``localCheckpoint`` truncates the growing lineage every
    round. Pair identity is the (left, right) STRUCT, never a string
    concat — 'ab'+'c' and 'a'+'bc' must not collide.
    """
    freqs = word_frequencies(docs, text_col)
    syms = freqs.select(
        F.split("word", "").alias("_s"), "freq"
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = syms.where(F.size("_s") >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_s") - 2),
                    lambda i: F.struct(
                        F.element_at("_s", i + 1).alias("l"),
                        F.element_at("_s", i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(
                F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, n = best[0]["p"]["l"], best[0]["p"]["r"], int(best[0]["n"])
        merges.append((left, right, n))
        tok = left + right
        merged = F.aggregate(
            F.col("_s"),
            F.array().cast("array<string>"),
            lambda acc, t: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (t == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(tok))
                ),
            ).otherwise(F.concat(acc, F.array(t))),
        )
        syms = syms.select(merged.alias("_s"), "freq").localCheckpoint()
    return merges
