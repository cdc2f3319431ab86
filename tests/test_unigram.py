"""Unigram-LM tokenizer (operators/unigram.py): hand-computable pins for
the seed vocabulary, the integer Viterbi costs, the packed-metric DP, the
E-step usage counts, and the trainer's coverage contract."""

from pyspark.sql import functions as F

from albedo_spark.operators.bpe import word_frequencies
from albedo_spark.operators.unigram import (
    seed_vocab,
    train_unigram,
    unigram_doc_stats,
    viterbi_piece_usage,
    viterbi_word_stats,
    vocab_costs,
    word_pieces,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "ab ab"), (2, "abc"), (3, None), (4, "   ")],
        "doc_id long, text string",
    )


def test_unigram_hand_example(spark):
    """Fully hand-computed: corpus {ab×2, abc×1}.
    pieces pf: a=3, b=3, c=1, ab=3, bc=1, abc=1.
    vocab (singles + top-2 multis by pf desc, piece asc):
      {a:3, b:3, c:1, ab:3, abc:1}; T=11.
    cost = (10^6·11)//pf: a=b=ab=3666666, c=abc=11000000.
    "ab": [ab]=3666666 beats [a,b]=7333332 -> np 1, cost 3666666.
    "abc": [abc]=11000000 beats [ab,c]=14666666 -> np 1, cost 11000000.
    """
    out = {
        r.doc_id: (r.n_words, r.n_pieces, r.cost)
        for r in unigram_doc_stats(_docs(spark), vocab_size=2).collect()
    }
    assert out == {
        1: (2, 2, 7333332),
        2: (1, 1, 11000000),
        3: (0, 0, 0),  # NULL text -> zeros (left-join contract)
        4: (0, 0, 0),  # whitespace-only -> zeros
    }


def test_seed_vocab_composition(spark):
    """All singles always present; multis are the top-k by (pf desc,
    piece asc) — abc(1) beats bc(1) lexicographically."""
    words = word_frequencies(_docs(spark))
    v = {r.piece: r.pf for r in seed_vocab(word_pieces(words), 2).collect()}
    assert v == {"a": 3, "b": 3, "c": 1, "ab": 3, "abc": 1}


def test_viterbi_tie_breaks_to_fewer_pieces(spark):
    """When two segmentations cost the same, the packed metric picks the
    one with fewer pieces: vocab {x:2, xx:1} over word "xx" with T=3 —
    [xx] cost 3000000 np1 vs [x,x] cost 3000000 np2 (1500000 each):
    equal cost, packed metric prefers np1."""
    docs = spark.createDataFrame([(1, "xx")], "doc_id long, text string")
    words = word_frequencies(docs)
    vc = vocab_costs(seed_vocab(word_pieces(words), 1))
    ws = {r.word: (r.n_pieces, r.cost) for r in
          viterbi_word_stats(words, vc).collect()}
    assert ws == {"xx": (1, 3000000)}


def test_word_cap_excludes_long_words(spark):
    """Words longer than word_cap are excluded from stats by the
    deterministic cap (both engines) — doc keeps zeros if ALL its words
    are over-cap."""
    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "ab")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.n_words
        for r in unigram_doc_stats(docs, vocab_size=4, word_cap=4).collect()
    }
    assert out[1] == 0 and out[2] == 1


def test_piece_usage_backtrack(spark):
    """E-step usage on the hand example: optimal segmentations are
    [ab]×2 and [abc]×1 — singles unused."""
    words = word_frequencies(_docs(spark))
    vc = vocab_costs(seed_vocab(word_pieces(words), 2))
    usage = {r.piece: r.usage for r in viterbi_piece_usage(words, vc).collect()}
    assert usage == {"ab": 2, "abc": 1}


def test_trainer_prunes_but_keeps_coverage(spark):
    """M-step prune to 1 multi keeps 'ab' (usage 2 > abc 1) and ALL
    singles (coverage floor) — every corpus word stays segmentable with
    the trained vocab."""
    docs = _docs(spark)
    trained = train_unigram(docs, seed_size=2, prune_to=1)
    got = {r.piece: r.cost for r in trained.collect()}
    pieces = set(got)
    assert pieces == {"a", "b", "c", "ab"}
    # hand-computed trained COSTS (q159's arithmetic): usage ab=2,
    # abc=1 (pruned); singles floor 1 each -> kept pf {a:1, b:1, c:1,
    # ab:2}, T=5, cost = (10^6*5) // pf
    assert got == {"a": 5_000_000, "b": 5_000_000, "c": 5_000_000,
                   "ab": 2_500_000}
    words = word_frequencies(docs)
    ws = viterbi_word_stats(words, trained)
    # both words still reach a final state
    assert ws.count() == 2
    # 'abc' now segments as [ab, c] (abc pruned)
    np_by_word = {r.word: r.n_pieces for r in ws.collect()}
    assert np_by_word == {"ab": 1, "abc": 2}


def test_vocab_costs_overflow_tripwire(spark):
    """BIGINT-headroom guard: a vocabulary whose mass T exceeds _T_CEIL
    must raise LOUDLY at execution time — past that ceiling the packed
    Viterbi metric can wrap identically in Spark and the SQL oracle, so
    the hash gate could never catch it. Under the ceiling, costs flow
    through unchanged (no extra driver action on the happy path)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from albedo_spark.operators.unigram import _T_CEIL

    errs = (SparkRuntimeException, Py4JJavaError, Exception)

    ok = spark.createDataFrame(
        [("a", _T_CEIL - 10), ("b", 10)], "piece string, pf long"
    )
    got = {r.piece: r.cost for r in vocab_costs(ok).collect()}
    assert got["b"] == (1_000_000 * _T_CEIL) // 10

    over = spark.createDataFrame(
        [("a", _T_CEIL), ("b", 1)], "piece string, pf long"
    )
    with pytest.raises(errs, match="headroom"):
        vocab_costs(over).collect()


def test_doc_stats_scale_invariance_partitioning(spark):
    """Same results on a repartitioned corpus (no partition-order
    dependence anywhere in the vocab / DP path)."""
    docs = spark.createDataFrame(
        [(i, f"doc {i % 7} text with words w{i % 11} and w{i % 5}")
         for i in range(60)],
        "doc_id long, text string",
    )
    a = {tuple(r) for r in unigram_doc_stats(docs, vocab_size=8).collect()}
    b = {
        tuple(r)
        for r in unigram_doc_stats(docs.repartition(16), vocab_size=8).collect()
    }
    assert a == b


def test_segment_words_emits_piece_sequences(spark):
    """viterbi_segment_words (q155's operator): seg strings are the
    actual optimal segmentations, in reading order. Hand example: with
    the full seed vocab 'ab'->[ab], 'abc'->[abc]; after pruning 'abc'
    from the vocab, 'abc' must segment as ab|c."""
    from albedo_spark.operators.unigram import viterbi_segment_words

    docs = _docs(spark)
    words = word_frequencies(docs)
    vc = vocab_costs(seed_vocab(word_pieces(words), 2))
    segs = {r.word: (r.n_pieces, r.seg)
            for r in viterbi_segment_words(words, vc).collect()}
    assert segs == {"ab": (1, "ab"), "abc": (1, "abc")}

    trained = train_unigram(docs, seed_size=2, prune_to=1)
    segs2 = {r.word: (r.n_pieces, r.seg)
             for r in viterbi_segment_words(words, trained).collect()}
    assert segs2 == {"ab": (1, "ab"), "abc": (2, "ab|c")}

    # multi-piece reading order on a longer word: only singles in vocab
    docs3 = spark.createDataFrame([(1, "dcba")], "doc_id long, text string")
    w3 = word_frequencies(docs3)
    vc3 = vocab_costs(seed_vocab(word_pieces(w3, 1), 0))
    segs3 = {r.word: r.seg for r in viterbi_segment_words(w3, vc3).collect()}
    assert segs3 == {"dcba": "d|c|b|a"}
