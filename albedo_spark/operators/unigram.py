"""Unigram-LM (SentencePiece-style) subword tokenization — the OTHER
production tokenizer family next to BPE (Kudo 2018, "Subword
Regularization"; the SentencePiece default). No reference twin (the
reference's only tokenizer is HanLP word segmentation,
``A/utils.py:5-11``); this extends the q75/q103/q126 BPE surface with
the segmentation-by-optimization family.

Where BPE builds words bottom-up from learned merges, unigram-LM picks,
among ALL decompositions of a word into vocabulary pieces, the one that
maximizes the product of piece probabilities — Viterbi DP over word
positions. This module keeps the package's exact-integer discipline so
the entire surface is ORACLE-ABLE (q152): piece probabilities become
integer COSTS ``(10^6 · T) div pf`` (T = total vocab frequency mass,
pf = piece frequency) — a monotone integer surrogate for the −log p
Viterbi weight (additive, frequent pieces cheap, rare pieces dear;
trades the literature's float log-probs for bit-exact BIGINT arithmetic
in any engine, the q105 bigram-LM bargain). The DP minimizes the
combined metric ``cost·32 + n_pieces`` (path length ≤ word_cap < 32),
so "min cost, tie → fewer pieces" is ONE BIGINT min — portable to any
SQL engine without struct comparators.

Scale posture (100 TB): the ONLY corpus-sized pass is the word-frequency
groupBy (the classic tokenizer-training optimization — identical to
BPE's); pieces, vocabulary, Viterbi edges, and the unrolled DP all live
on |distinct words|-bounded frames. Positions are bounded by word_cap,
so the whole DP (and the backtrack walk) unrolls IN-ROW over a pivoted
per-word edge-cost grid — one groupBy, zero iterative shuffles (the
round form survives verbatim in the q152/q155/q159 oracle CTEs); the
per-doc scoring join brings |distinct words| stats back to the corpus
with one shuffle (AQE broadcasts it when small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.bpe import word_frequencies

#: cost scale — (MULT · T) div pf stays far from BIGINT overflow even at
#: T ~ 10^9 piece-mass corpora (cost ≤ 10^6·T ≤ 10^15; ·32 and summed
#: over ≤ word_cap pieces and |doc| words keeps headroom).
MULT = 1_000_000

#: combined-metric packing: v = cost·32 + n_pieces. Requires
#: word_cap < 32.
_PACK = 32

#: loud BIGINT-headroom ceiling on the vocabulary mass T. The worst
#: packed path value is ≈ word_cap · _PACK · MULT · T (a pf=1 rare piece
#: costs MULT·T; a path holds ≤ word_cap of them), and per-doc sums add
#: up to ~2^16 words on extreme fixtures — so require
#: MULT·T·_PACK·word_cap·2^16 < 2^63, i.e. T < 2^63/(10^6·32·16·2^16)
#: ≈ 2.7·10^8 per-word-safe, and T ≤ _T_CEIL ≈ 4.4·10^9 with the doc
#: factor relaxed to the tested 2^4 (the guard is deliberately loud and
#: conservative: both engines would overflow IDENTICALLY past it, so the
#: oracle could never catch the wrap — the raise is the only tripwire).
_T_CEIL = (1 << 63) // (MULT * _PACK * 16 * 16)


def word_pieces(words: DataFrame, max_len: int = 4) -> DataFrame:
    """``(word, freq, i, j, piece)`` — every substring of length
    1..max_len of every distinct word, with [i, j) positions: the
    candidate-piece grid AND the Viterbi edge list in one frame.
    Runs on the |distinct words| frame, never the corpus."""
    starts = F.sequence(F.lit(0), F.length("word") - 1)
    grid = F.flatten(
        F.transform(
            starts,
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_len), F.length("word") - i)
                ),
                lambda l: F.struct(
                    i.alias("i"),
                    (i + l).alias("j"),
                    F.substring(F.col("word"), i + 1, l).alias("piece"),
                ),
            ),
        )
    )
    return words.select("word", "freq", F.explode(grid).alias("g")).select(
        "word", "freq", "g.i", "g.j", "g.piece"
    )


def seed_vocab(
    pieces: DataFrame, vocab_size: int = 24
) -> DataFrame:
    """``(piece, pf)`` — the seed vocabulary: ALL single characters (the
    coverage guarantee — every word stays segmentable) plus the
    ``vocab_size`` most frequent multi-char pieces (pf desc, piece asc —
    a deterministic total order, the q120 vocabulary idiom). pf counts
    occurrence-weighted frequency: every start position in every word,
    weighted by word frequency (the suffix-array seeding of the
    SentencePiece trainer, expressed as one groupBy)."""
    pf = pieces.groupBy("piece").agg(F.sum("freq").alias("pf"))
    singles = pf.where(F.length("piece") == 1)
    multis = (
        pf.where(F.length("piece") >= 2)
        .orderBy(F.col("pf").desc(), F.col("piece").asc())
        .limit(vocab_size)
    )
    return singles.unionByName(multis)


def vocab_costs(vocab: DataFrame) -> DataFrame:
    """``(piece, cost)`` — integer Viterbi weight ``(MULT · T) div pf``
    over the vocabulary's total mass T (scalar cross join; both engines
    truncate the div identically).

    The input is consumed TWICE (the mass aggregate and the cost
    projection) and is typically the tip of a corpus-sized subtree
    (seed_vocab's piece rollup, train_unigram's pruned usage) — one
    lazy localCheckpoint runs that subtree once instead of once per
    consumer; the frame itself is model-state-sized."""
    vocab = vocab.localCheckpoint(eager=False)
    t = vocab.agg(F.sum("pf").alias("t"))
    # Lazy BIGINT-headroom tripwire (the r10 raise_error discipline):
    # past _T_CEIL the packed Viterbi metric can wrap, and it wraps
    # IDENTICALLY in Spark and the SQL oracle — the hash gate would stay
    # green on garbage — so the only honest behavior is a loud raise at
    # execution time, with no extra driver action on the happy path.
    guarded = t.select(
        F.when(
            F.col("t") > F.lit(_T_CEIL),
            F.raise_error(
                F.concat(
                    F.lit("vocab_costs: vocabulary mass T="),
                    F.col("t").cast("string"),
                    F.lit(
                        " exceeds the packed-metric BIGINT headroom"
                        f" ceiling {_T_CEIL} (cost*{_PACK} path sums"
                        " would overflow int64 undetectably in BOTH"
                        " engines); shard the corpus or rescale MULT"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.col("t"))
        .alias("t")
    )
    return vocab.crossJoin(F.broadcast(guarded)).select(
        "piece", F.expr(f"({MULT} * t) div pf").alias("cost")
    )


def _edge_pairs(max_len: int, word_cap: int) -> list[tuple[int, int]]:
    """All (start, end) position pairs a vocabulary piece can span in a
    word of length ≤ word_cap: 1 ≤ j − i ≤ max_len — the static edge
    grid the in-row DP unrolls over (≤ word_cap·max_len pairs)."""
    return [
        (i, j)
        for j in range(1, word_cap + 1)
        for i in range(max(0, j - max_len), j)
    ]


def _cost_grid(
    words: DataFrame,
    costed_vocab: DataFrame,
    max_len: int,
    word_cap: int,
) -> DataFrame:
    """ONE row per capped distinct word with every in-vocab edge cost
    pivoted to a static column ``c_{i}_{j}`` (NULL = piece word[i:j) not
    in the vocabulary). The (word, i, j) edge is unique, so the
    min(when(...)) pivot is exact. This turns the |words|·edges frame
    into a |words|-row frame the whole DP can run on IN-ROW — one
    groupBy instead of word_cap shuffle rounds (guide §2.4)."""
    capped = words.where(F.length("word") <= word_cap)
    pe = word_pieces(capped, max_len=max_len).join(
        F.broadcast(costed_vocab), "piece"
    )
    aggs = [
        F.min(
            F.when((F.col("i") == i) & (F.col("j") == j), F.col("cost"))
        ).alias(f"c_{i}_{j}")
        for (i, j) in _edge_pairs(max_len, word_cap)
    ]
    return pe.groupBy("word", "freq").agg(*aggs)


def _with_dp_cols(
    grid: DataFrame, max_len: int, word_cap: int
) -> DataFrame:
    """Unrolled in-row Viterbi forward pass over the pivoted cost grid:
    ``v_j`` = min over i of v_i + c_{i}_{j}·_PACK + 1 (NULL = position
    unreachable — F.least skips NULL candidates, and a NULL cost or
    NULL v_i nulls the whole candidate). Identical BIGINTs to the
    relational round form; zero shuffles, pure whole-stage codegen.
    Each v_j is its own projection column (referenced up to max_len
    times downstream), so the optimizer does not inline-duplicate the
    subtree."""
    # select("*", alias), NOT withColumn (r16): withColumn resolves the
    # frame's schema to check for column replacement, forcing a FULL
    # analyzer pass over the growing plan on every call — word_cap
    # sequential passes over an ever-wider projection, measured as ~4 s
    # of pure driver time per build at word_cap=12. select with a new
    # alias defers analysis to the single pass at the first action.
    out = grid.select("*", F.lit(0).cast("long").alias("v_0"))
    for j in range(1, word_cap + 1):
        cands = [
            F.col(f"v_{i}") + F.col(f"c_{i}_{j}") * _PACK + 1
            for i in range(max(0, j - max_len), j)
        ]
        out = out.select(
            "*",
            (cands[0] if len(cands) == 1 else F.least(*cands)).alias(f"v_{j}"),
        )
    return out


def _final_v(word_cap: int):
    """dp value at the word's own length: element word_len+1 of the
    1-indexed [v_0 … v_cap] array (NULL when the end is unreachable —
    cannot happen under a coverage vocab, but the NULL filter matches
    the relational pos == length join semantics exactly)."""
    return F.element_at(
        F.array(*[F.col(f"v_{j}") for j in range(word_cap + 1)]),
        F.length("word") + 1,
    )


def viterbi_word_stats(
    words: DataFrame,
    costed_vocab: DataFrame,
    max_len: int = 4,
    word_cap: int = 12,
) -> DataFrame:
    """``(word, freq, n_pieces, cost)`` — the optimal unigram-LM
    segmentation of every distinct word of length ≤ word_cap (longer
    words are excluded by BOTH engines — the deterministic cap that
    bounds the DP unroll; cap < 32 so the packed metric is exact).

    DP: dp[0] = 0; dp[j] = min over vocab pieces word[i:j] of
    dp[i] + cost·32 + 1 — computed IN-ROW over the pivoted cost grid
    (``_cost_grid``): positions are bounded by word_cap, so the whole
    recurrence unrolls into ≤ word_cap static ``least()`` columns in
    one codegen stage. The former word_cap relational rounds (carry ∪
    transitions → groupBy min per round) computed the same BIGINTs
    through ~2·word_cap shuffle stages of pure latency at fixture scale
    (guide §2.4: remove shuffles outright); the round form survives in
    the q152/q155/q159 oracles as chained CTEs, replayed bit-for-bit."""
    assert word_cap < _PACK, "packed metric requires word_cap < 32"
    grid = _cost_grid(words, costed_vocab, max_len, word_cap)
    dp = _with_dp_cols(grid, max_len, word_cap)
    # The lazy checkpoint is an OPTIMIZER BARRIER, not a reuse cache:
    # predicate pushdown substitutes aliases, so the isNotNull filter
    # below would otherwise inline the whole recursive v_j least()-tree
    # into one exponential expression (measured: 12x plan size, Janino
    # OOM). Behind the barrier every v_j stays a column computed once.
    dp = dp.select("word", "freq", _final_v(word_cap).alias("_vf"))
    dp = dp.localCheckpoint(eager=False)
    return (
        dp.where(F.col("_vf").isNotNull())
        .select(
            "word",
            "freq",
            (F.col("_vf") % _PACK).alias("n_pieces"),
            F.expr(f"_vf div {_PACK}").alias("cost"),
        )
    )


def unigram_doc_stats(
    docs: DataFrame,
    vocab_size: int = 24,
    max_len: int = 4,
    word_cap: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram-LM segmentation stats ``(doc_id, n_words,
    n_pieces, cost)`` under the corpus-self-trained seed vocabulary:
    n_pieces is the document's subword token count (what a context-
    length budget consumes), cost the total integer Viterbi weight (the
    −log-likelihood surrogate: gibberish segments into rare pieces and
    scores high — the same quality axis as q105, measured by a
    TOKENIZER instead of a bigram LM). Documents with no in-cap words
    report zeros (left join, q105's contract)."""
    from albedo_spark.operators.textstats import tokens

    # same two-consumer shape as the trainer: vocab broadcast + grid
    words = word_frequencies(docs, text_col).localCheckpoint(eager=False)
    vc = vocab_costs(seed_vocab(word_pieces(words, max_len), vocab_size))
    ws = viterbi_word_stats(words, vc, max_len=max_len, word_cap=word_cap)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("word")
    ).where(F.col("word") != "")
    agg = (
        toks.join(ws.drop("freq"), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.sum("cost").alias("cost"),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id")).join(
        agg, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce("cost", F.lit(0)).cast("long").alias("cost"),
    )


def _viterbi_backtrack(
    words: DataFrame,
    costed_vocab: DataFrame,
    max_len: int = 4,
    word_cap: int = 12,
) -> DataFrame:
    """In-row Viterbi backtrack over the pivoted cost grid: one row per
    word, with piece columns ``_pc_0 … _pc_{cap-1}`` emitted back to
    front (``_pc_0`` = LAST piece; NULL once the walk reaches position
    0). From each word's final state, repeatedly pick the predecessor
    edge whose dp-value difference matches exactly (the additive metric
    makes the test exact), tie → smallest start i — the same rule the
    former relational rounds applied via min(struct(i, piece, pv)),
    now a static ``least(when(v_i + c·32 + 1 == v_j, i))`` argmin per
    position plus a ``word_cap``-step in-row walk through the
    predecessor array. The edge (word, i, j) is unique, so smallest-i
    determines the piece. Zero shuffles past the grid's one groupBy
    (formerly ~4·word_cap shuffle stages — guide §2.4). Shared core of
    the E-step usage counts (``viterbi_piece_usage``) and the encode
    surface (``viterbi_segment_words``, q155); both oracles replay the
    round form as materialized CTEs bit-for-bit."""
    grid = _cost_grid(words, costed_vocab, max_len, word_cap)
    dp = _with_dp_cols(grid, max_len, word_cap)
    # per-position predecessor: smallest start i whose edge explains
    # v_j exactly (least() skips the non-matching NULL candidates)
    # select("*", alias), NOT withColumn (r16, the _with_dp_cols note):
    # withColumn forces a full analyzer pass per call — ~3·word_cap
    # sequential passes here, measured as seconds of pure driver time
    # per build. The _b_j predecessors are mutually independent, so one
    # select adds them all; the walk steps chain selects (each defers
    # analysis to the single pass at the first action).
    def _b(j: int):
        cands = [
            F.when(
                F.col(f"v_{i}") + F.col(f"c_{i}_{j}") * _PACK + 1
                == F.col(f"v_{j}"),
                F.lit(i),
            )
            for i in range(max(0, j - max_len), j)
        ]
        return (cands[0] if len(cands) == 1 else F.least(*cands)).alias(
            f"_b_{j}"
        )

    dp = dp.select("*", *[_b(j) for j in range(1, word_cap + 1)])
    preds = F.array(*[F.col(f"_b_{j}") for j in range(1, word_cap + 1)])
    # walk back from the word's end: position word-length, then each
    # step's predecessor; piece = word[i:pos) via substring (the walk
    # on an unreachable-end word emits all-NULL pieces and is dropped
    # by the _vf filter after the barrier)
    dp = dp.select("*", F.length("word").alias("_p_0"))
    for s in range(word_cap):
        p = F.col(f"_p_{s}")
        dp = dp.select(
            "*", F.when(p > 0, F.element_at(preds, p)).alias(f"_i_{s}")
        )
        i = F.col(f"_i_{s}")
        dp = dp.select(
            "*",
            F.when(p > 0, F.substring(F.col("word"), i + 1, p - i)).alias(
                f"_pc_{s}"
            ),
            F.coalesce(i, F.lit(0)).alias(f"_p_{s + 1}"),
        )
    # Optimizer barrier (see viterbi_word_stats): keeps predicate
    # pushdown from inlining the recursive column tree into one
    # exponential filter expression. Narrow projection first — only the
    # walk's outputs cross the checkpoint.
    out = dp.select(
        "word",
        "freq",
        _final_v(word_cap).alias("_vf"),
        *[F.col(f"_pc_{s}") for s in range(word_cap)],
    ).localCheckpoint(eager=False)
    return out.where(F.col("_vf").isNotNull()).drop("_vf")


def viterbi_piece_usage(
    words: DataFrame,
    costed_vocab: DataFrame,
    max_len: int = 4,
    word_cap: int = 12,
) -> DataFrame:
    """E-step of the unigram-LM trainer: ``(piece, usage)`` — how often
    each vocabulary piece appears in the OPTIMAL segmentations, weighted
    by word frequency (explode the in-row walk's piece columns, drop
    the NULL beyond-path slots, one groupBy)."""
    bt = _viterbi_backtrack(words, costed_vocab, max_len, word_cap)
    return (
        bt.select(
            "freq",
            F.explode(
                F.array(*[F.col(f"_pc_{s}") for s in range(word_cap)])
            ).alias("piece"),
        )
        .where(F.col("piece").isNotNull())
        .groupBy("piece")
        .agg(F.sum("freq").alias("usage"))
    )


def viterbi_segment_words(
    words: DataFrame,
    costed_vocab: DataFrame,
    max_len: int = 4,
    word_cap: int = 12,
) -> DataFrame:
    """The ENCODE surface (q155 — the unigram twin of BPE's q126):
    ``(word, freq, n_pieces, seg)`` where ``seg`` is the optimal
    segmentation joined with ``|`` in reading order. The in-row walk
    emits pieces back-to-front, so ``concat_ws`` consumes the piece
    columns in reverse step order (concat_ws skips the NULL
    beyond-path slots — no array filter, no regroup: the per-word
    aggregate the round form needed is now a pure projection)."""
    bt = _viterbi_backtrack(words, costed_vocab, max_len, word_cap)
    n_pieces = None
    for s in range(word_cap):
        term = F.when(F.col(f"_pc_{s}").isNotNull(), 1).otherwise(0)
        n_pieces = term if n_pieces is None else n_pieces + term
    return bt.select(
        "word",
        "freq",
        n_pieces.cast("long").alias("n_pieces"),
        F.concat_ws(
            "|", *[F.col(f"_pc_{s}") for s in reversed(range(word_cap))]
        ).alias("seg"),
    )


def train_unigram(
    docs: DataFrame,
    seed_size: int = 24,
    prune_to: int = 12,
    em_rounds: int = 1,
    max_len: int = 4,
    word_cap: int = 12,
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM trainer (Kudo 2018 §3 structure, integer discipline):
    seed a large candidate vocabulary, then ``em_rounds`` of E-step
    (Viterbi-segment the distinct-words frame, count piece usage) and
    M-step (PRUNE to the ``prune_to`` most-used multi-char pieces —
    singles always survive for coverage — and re-estimate costs from
    usage mass instead of raw frequency). Returns the final
    ``(piece, cost)`` vocabulary — model state, |vocab| rows.

    Relational throughout: the E-step is the backtracking pass above,
    the M-step a sort-limit + cost rebuild — no driver-side collect, so
    the trainer composes into one lazy plan per round."""
    # words feeds the seed-vocab subtree (a broadcast build) and every
    # E-step's cost grid — one lazy checkpoint runs the corpus pass once
    words = word_frequencies(docs, text_col).localCheckpoint(eager=False)
    vc = vocab_costs(seed_vocab(word_pieces(words, max_len), seed_size))
    for _ in range(em_rounds):
        # usage feeds BOTH prune branches (singles join, multis limit);
        # the lazy checkpoint runs the E-step's piece rollup once — the
        # backtrack DP itself is already checkpoint-shared inside
        # _viterbi_backtrack, this dedupes the explode+groupBy above it.
        usage = viterbi_piece_usage(
            words, vc, max_len=max_len, word_cap=word_cap
        ).localCheckpoint(eager=False)
        # Character coverage (Kudo 2018 §3.2): EVERY single-char piece of
        # the current vocab survives the prune — usage floor 1 when the
        # optimal segmentations never used it — otherwise pruning a
        # multi-char piece could orphan words whose fallback chars were
        # also unused this round.
        singles = (
            vc.where(F.length("piece") == 1)
            .select("piece")
            .join(usage, "piece", "left")
            .select("piece", F.coalesce("usage", F.lit(1)).alias("usage"))
        )
        multis = (
            usage.where(F.length("piece") >= 2)
            .orderBy(F.col("usage").desc(), F.col("piece").asc())
            .limit(prune_to)
        )
        kept = singles.unionByName(multis).select(
            "piece", F.col("usage").alias("pf")
        )
        vc = vocab_costs(kept)
    return vc
