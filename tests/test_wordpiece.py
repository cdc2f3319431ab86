"""WordPiece trainer/statistics/inference (operators/wordpiece.py) — the
hand-checkable HuggingFace-course corpus (hug×10 pug×5 pun×12 bun×4
hugs×5), the likelihood argmax with exact-rational tie-breaking, the
``##``-aware merge spelling, greedy longest-match inference, and the
BIGINT-headroom tripwire."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _corpus(spark):
    words = ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )


def test_wp_symbols_marking(spark):
    from albedo_spark.operators.wordpiece import wp_symbols

    got = (
        spark.createDataFrame([("hey",), ("a",)], "word string")
        .select("word", wp_symbols("word").alias("s"))
        .collect()
    )
    by_word = {r.word: list(r.s) for r in got}
    assert by_word == {"hey": ["h", "##e", "##y"], "a": ["a"]}


def test_wp_pair_scores_hand_example(spark):
    """Iteration-0 statistics on the course corpus: (##g,##s) scores
    5/(20·5) = 1/20 — strictly above every other pair's 1/36 — so it
    leads; the 1/36 group follows in (left, right) lexicographic order.
    score_ppb is the exact floor of score·10^9."""
    from albedo_spark.operators.wordpiece import wp_pair_scores

    rows = wp_pair_scores(_corpus(spark), k=6).collect()
    got = [
        (r.left_sym, r.right_sym, r.pair_n, r.left_n, r.right_n, r.score_ppb)
        for r in rows
    ]
    assert got[0] == ("##g", "##s", 5, 20, 5, 50_000_000)
    # the five 1/36 pairs: floor(1e9/36) = 27_777_777, tie-broken (l, r)
    assert got[1:] == [
        ("##u", "##g", 20, 36, 20, 27_777_777),
        ("##u", "##n", 16, 36, 16, 27_777_777),
        ("b", "##u", 4, 4, 36, 27_777_777),
        ("h", "##u", 15, 15, 36, 27_777_777),
        ("p", "##u", 17, 17, 36, 27_777_777),
    ]


def test_learn_wordpiece_hand_example(spark):
    """Two trainer rounds on the course corpus. Round 1 merges
    (##g, ##s) → ##gs (the likelihood winner — BPE would have merged the
    count-20 (##u, ##g) instead: the criterion, not the machinery, is
    what distinguishes the trainers). Round 2: every surviving pair ties
    at exactly 1/36, and the exact-Fraction lexicographic tie-break picks
    (##u, ##g) → ##ug. Counts carried in the merge record are the
    pre-merge statistics, delta-maintained."""
    from albedo_spark.operators.wordpiece import learn_wordpiece

    merges = learn_wordpiece(_corpus(spark), n_merges=2)
    assert merges == [
        ("##g", "##s", "##gs", 5, 20, 5),
        ("##u", "##g", "##ug", 15, 36, 15),
    ]


def test_learn_wordpiece_matches_naive_reference(spark):
    """The delta-maintained trainer must equal a from-scratch naive
    trainer (recount everything each round) on a messier corpus — the
    same equivalence discipline as the BPE pair-delta trainer."""
    from fractions import Fraction

    from albedo_spark.operators.wordpiece import learn_wordpiece

    words = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3 + ["aaa"] * 2
    )
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )

    def naive(word_freqs: dict[str, int], n_merges: int):
        segs = {
            w: [w[0]] + ["##" + c for c in w[1:]] for w in word_freqs
        }
        out = []
        for _ in range(n_merges):
            pair_n: dict[tuple, int] = {}
            sym_n: dict[str, int] = {}
            for w, f in word_freqs.items():
                s = segs[w]
                for t in s:
                    sym_n[t] = sym_n.get(t, 0) + f
                for a, b in zip(s, s[1:]):
                    pair_n[(a, b)] = pair_n.get((a, b), 0) + f
            if not pair_n:
                break
            (l, r), n = min(
                pair_n.items(),
                key=lambda kv: (
                    -Fraction(kv[1], sym_n[kv[0][0]] * sym_n[kv[0][1]]),
                    kv[0],
                ),
            )
            tok = l + (r[2:] if r.startswith("##") else r)
            out.append((l, r, tok, n, sym_n[l], sym_n[r]))
            for w, s in segs.items():
                new, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        new.append(tok)
                        i += 2
                    else:
                        new.append(s[i])
                        i += 1
                segs[w] = new
        return out

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 2}
    assert learn_wordpiece(docs, n_merges=6) == naive(freqs, 6)


def test_wordpiece_encode_longest_match(spark):
    """Greedy longest-match-first against the final vocabulary (BERT's
    inference rule — not merge replay): merged pieces win over their
    prefixes, unseen characters sink the whole word to [UNK]."""
    from albedo_spark.operators.wordpiece import (
        learn_wordpiece,
        wordpiece_encode_vocab,
        wp_vocab,
    )

    docs = _corpus(spark)
    merges = learn_wordpiece(docs, n_merges=2)  # ##gs, ##ug
    vocab = wp_vocab(docs, merges)
    assert vocab[-2:] == ["##gs", "##ug"]
    words = spark.createDataFrame(
        [("hug",), ("hugs",), ("bug",), ("xyz",)], "word string"
    )
    got = {
        r.word: list(r.pieces)
        for r in wordpiece_encode_vocab(words, vocab).collect()
    }
    assert got == {
        "hug": ["h", "##ug"],
        "hugs": ["h", "##ug", "##s"],
        "bug": ["b", "##ug"],
        "xyz": ["[UNK]"],
    }


def test_wp_headroom_tripwire(spark, monkeypatch):
    """Past the BIGINT-headroom ceiling both engines wrap identically, so
    the only honest behavior is a loud execution-time raise."""
    from albedo_spark.operators import wordpiece

    monkeypatch.setattr(wordpiece, "_N_CEIL", 10)
    with pytest.raises(Exception, match="headroom"):
        wordpiece.wp_pair_scores(_corpus(spark), k=5).collect()
