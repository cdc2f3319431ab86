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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.textstats import tokens


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the normalized whitespace tokenization.

    The ONLY corpus-sized pass of every tokenizer trainer (BPE,
    unigram-LM, WordPiece all start here) — balance an unsplittable
    scan before the tokenize+explode (no-op on wide inputs)."""
    from albedo_spark.io import widen

    return (
        widen(docs.where(F.col(text_col).isNotNull()).select(F.col(text_col)))
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


def _adjacent(s) -> "F.Column":
    """Adjacent symbol pairs of an array column as (l, r) structs —
    ``slice``-based so a 1-symbol word yields an EMPTY pair array (a
    ``sequence(0, size-2)`` formulation would produce a descending
    sequence and out-of-range ``element_at`` for size 1). Pair identity
    is the struct, never a string concat — 'ab'+'c' and 'a'+'bc' must
    not collide."""
    s = F.col(s) if isinstance(s, str) else s
    return F.zip_with(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )


def _greedy_merge(s, left: str, right: str) -> "F.Column":
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) in a symbol array ('aaa' + (a,a) → [aa, a]) — the
    standard BPE fold, as a JVM-side HOF aggregate."""
    tok = left + right
    return F.aggregate(
        s if not isinstance(s, str) else F.col(s),
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(tok))),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 24,
    round_stats: list | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus (Sennrich et al.
    2016): the full iterative trainer on top of the one-step statistics
    above. Returns the merge list ``[(left, right, weighted_count), …]``
    in learned order — the artifact a tokenizer ships.

    This is the PAIR-DELTA trainer (the optimization Sennrich's own
    ``learn_bpe.py`` applies): after a merge, only words CONTAINING the
    merged pair re-segment, and the global pair statistics update by the
    delta those words contribute — per-round cost is proportional to the
    affected words, not the whole vocabulary (a naive trainer re-folds
    every word every round: 32k merges × |vocab| work, mostly no-ops).

    Shape per round, in Spark terms:

    1. argmax over the driver-held pair-stats dict — count desc, then
       (left, right) lexicographic, so ties are deterministic. No Spark
       job at all (the naive trainer paid a full explode+aggregate here).
    2. ONE job: filter the vocab frame to words whose symbol array
       contains the pair adjacently (cheap JVM predicate scan), and for
       just those words evaluate the greedy merge fold; the (old symbols,
       new symbols, freq) result is local-checkpointed — cost ∝ affected.
       The fold runs wide (in the shuffle-map stage), but the checkpoint
       lands in a HANDFUL of partitions: without that repartition each
       round's checkpoint would inherit the whole chain's partition
       count and the union below would DOUBLE partitions every round
       (32 → 512 in 9 rounds, measured) — task-launch overhead, not
       data, would dominate.
    3. ONE job over that small checkpointed frame: explode old pairs with
       weight −freq and new pairs with +freq, aggregate, and collect the
       deltas (rows ∝ distinct pairs in affected words) to update the
       dict. The merged pair's own count provably reaches 0 (every
       occurrence lives in an affected word), entries ≤ 0 are pruned.
    4. the vocab frame becomes ``unaffected ∪ re-segmented``, lazily;
       every ``checkpoint_every`` rounds a full ``repartition +
       localCheckpoint`` collapses the filter/union chain, so both scan
       depth and partition count stay bounded (amortized
       O(|vocab| / checkpoint_every) per round — the vocab frame is
       microscopic next to the corpus, so this shuffle is pennies).

    Driver-held state is the pair-statistics dict — the bounded,
    documented A7 exception: at iteration 0 its keys are the corpus's
    distinct CHARACTER bigrams (≤ |alphabet|², thousands for real text,
    nowhere near corpus-sized), and later rounds only add the delta
    pairs of affected words. This is exactly the stats structure every
    reference BPE trainer keeps in memory; the corpus itself never
    leaves the cluster — it collapsed to the |vocab|-sized frame once,
    and each round moves only the per-round deltas.

    ``round_stats``: pass a list to receive one dict per round —
    {round, pair, count, n_affected, wall_sec} — the instrumentation
    ``tools/scale_bpe.py`` uses to verify per-round cost tracks the
    affected-word count (adds one cheap count job per round; leave None
    in production).
    """
    import time as _time
    spark = docs.sparkSession
    width = spark.sparkContext.defaultParallelism
    aff_width = max(2, width // 8)
    freqs = word_frequencies(docs, text_col)
    syms = freqs.select(
        F.split("word", "").alias("_s"), "freq"
    ).localCheckpoint()

    # Iteration-0 statistics: one full explode+aggregate, collected once.
    stats: dict[tuple[str, str], int] = {}
    for row in (
        syms.select(F.explode(_adjacent("_s")).alias("p"), "freq")
        .groupBy("p")
        .agg(F.sum("freq").alias("n"))
        .collect()
    ):
        stats[(row["p"]["l"], row["p"]["r"])] = int(row["n"])

    merges: list[tuple[str, str, int]] = []
    since_checkpoint = 0
    for round_i in range(n_merges):
        if not stats:
            break
        t0 = _time.perf_counter()
        (left, right), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, n))

        contains = F.exists(
            _adjacent("_s"),
            lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
        )
        aff = (
            syms.where(contains)
            .select(
                F.col("_s").alias("_old"),
                _greedy_merge("_s", left, right).alias("_s"),
                "freq",
            )
            .repartition(aff_width)
            # LAZY: the deltas collect below is the round's first
            # action and materializes the checkpoint as a side effect —
            # one job per round instead of eager-materialize + collect
            # (the connected_components discipline); the next round's
            # vocab union reads the cached blocks either way.
            .localCheckpoint(eager=False)
        )
        deltas = (
            aff.select(
                F.explode(_adjacent("_old")).alias("p"),
                (-F.col("freq")).alias("d"),
            )
            .unionByName(
                aff.select(
                    F.explode(_adjacent("_s")).alias("p"),
                    F.col("freq").alias("d"),
                )
            )
            .groupBy("p")
            .agg(F.sum("d").alias("d"))
            .collect()
        )
        for row in deltas:
            key = (row["p"]["l"], row["p"]["r"])
            nv = stats.get(key, 0) + int(row["d"])
            if nv > 0:
                stats[key] = nv
            else:
                stats.pop(key, None)

        syms = syms.where(~contains).unionByName(aff.select("_s", "freq"))
        since_checkpoint += 1
        if since_checkpoint >= checkpoint_every:
            syms = syms.repartition(width).localCheckpoint()
            since_checkpoint = 0
        if round_stats is not None:
            # Freeze the wall BEFORE the instrumentation count job so the
            # probe's falling-cost signal is not diluted by a constant
            # per-round measurement overhead.
            wall = round(_time.perf_counter() - t0, 4)
            round_stats.append(
                {
                    "round": round_i,
                    "pair": (left, right),
                    "count": n,
                    "n_affected": aff.count(),
                    "wall_sec": wall,
                }
            )
    return merges


def segment_vocab(
    words: DataFrame,
    merges: list[tuple],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge list to a word vocabulary: one row per input
    word plus its BPE symbol sequence (``word, symbols array<string>``).
    The APPLY side of ``learn_bpe`` — what a tokenizer does at inference.

    Standard rank-order application (the algorithm every BPE tokenizer
    ships): repeatedly find the LOWEST-RANK adjacent pair present in the
    word and merge all its occurrences greedily left-to-right, until no
    adjacent pair is in the merge table. This replays training exactly:
    training merged pairs in that same global order, so a word segments
    identically whether it was in the training corpus or arrives later.

    This is the package's justified-pandas-UDF case (the jieba/Porter
    precedent): 32k merges cannot unroll into JVM expressions, and the
    per-word loop is inherently imperative. The cost is contained the
    same way the trainer contains it — callers run this over the
    DISTINCT WORD VOCABULARY (|vocab| rows), never the corpus;
    ``encode_corpus`` re-attaches by equi-join. Arrow-batched, rank dict
    broadcast once in the closure.
    """
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _seg(col: pd.Series) -> pd.Series:
        def enc(w: str) -> list[str]:
            syms = list(w)
            while len(syms) > 1:
                best = None
                for a, b in zip(syms, syms[1:]):
                    r = ranks.get((a, b))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, a, b)
                if best is None:
                    break
                _, left, right = best
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(enc)

    return words.select(
        F.col(word_col).alias("word"), _seg(F.col(word_col)).alias("symbols")
    )


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: ``(id, tokens
    array<string>, n_tokens)`` per document, tokens in original word
    order with each word segmented by ``segment_vocab``.

    Plan shape at 100 TB: the Python BPE loop touches only the DISTINCT
    word vocabulary (one groupBy-distinct over the exploded corpus —
    data volume |vocab| after that); the corpus side is pure JVM —
    posexplode, an equi-join on the word (broadcast by AQE when the
    segmented vocab is small, the common case), and one per-doc
    reassembly aggregate ordered by word position. Token order is exact:
    (pos, symbols) structs sort by position before flattening.
    """
    from albedo_spark.operators.textstats import tokens

    # Lazy checkpoint: the exploded token stream feeds BOTH the
    # distinct-vocab branch and the equi-join branch — without it one
    # action tokenizes and explodes the full corpus twice.
    exploded = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("_pos", "word"),
        )
        .where(F.col("word") != "")
        .localCheckpoint(eager=False)
    )
    vocab = segment_vocab(exploded.select("word").distinct(), merges)
    return (
        exploded.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("_pos"), F.col("symbols"))
                        )
                    ),
                    lambda s: s["symbols"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
