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
