"""Property-based checks (hypothesis) for pure components, plus a
randomized equivalence check for the bucketed range join. Spark-backed
properties keep example counts small — each example is a Spark job."""

import datetime as dt
import string

import pytest
from pyspark.sql import functions as F

from hypothesis import given, settings, strategies as st

from albedo_spark.operators.similarity import hyperplanes
from albedo_spark.transformers.stemmer import porter_stem

words = st.text(alphabet=string.ascii_letters, min_size=1, max_size=24)


@given(words)
@settings(max_examples=300, deadline=None)
def test_porter_total_and_deterministic(w):
    s1, s2 = porter_stem(w), porter_stem(w)
    assert s1 == s2
    assert s1 == s1.lower()
    assert 1 <= len(s1) <= len(w) + 1  # step-1b can append 'e'


@given(st.integers(2, 128), st.integers(1, 16), st.integers(0, 10_000))
@settings(max_examples=50, deadline=None)
def test_hyperplanes_deterministic_shape(dim, n, seed):
    a = hyperplanes(dim, n, seed)
    b = hyperplanes(dim, n, seed)
    assert a == b
    assert len(a) == n and all(len(p) == dim for p in a)


def test_gate_hash_is_order_insensitive():
    # the correctness-gate replica must hash identically under row AND
    # column permutations (that's what makes Spark/DuckDB comparable)
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import table_hash

    rows = [(1, "a", 2.5), (2, "b", None), (3, "c", 0.1)]
    cols = ["x", "y", "z"]
    n1, h1 = table_hash(rows, cols)
    n2, h2 = table_hash(list(reversed(rows)), cols)
    perm = [(r[2], r[0], r[1]) for r in rows]
    n3, h3 = table_hash(perm, ["z", "x", "y"])
    assert (n1, h1) == (n2, h2) == (n3, h3)


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(-900, 900)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(-900, 900)), min_size=1, max_size=12
    ),
)
@settings(max_examples=5, deadline=None)
def test_range_join_equals_naive_random(spark, left_rows, right_rows):
    from pyspark.sql import functions as F

    from albedo_spark.operators.rangejoin import time_range_join

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(u, i, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(left_rows)],
        "u int, lid int, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(u, i, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(right_rows)],
        "u int, rid int, rts timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in time_range_join(ldf, rdf, ["u"], "lts", "rts", -120, 60).collect()
    )
    want = sorted(
        (r.lid, r.rid)
        for r in ldf.join(
            rdf,
            (ldf.u == rdf.u)
            & (F.unix_timestamp(rdf.rts) >= F.unix_timestamp(ldf.lts) - 120)
            & (F.unix_timestamp(rdf.rts) <= F.unix_timestamp(ldf.lts) + 60),
        ).collect()
    )
    assert got == want


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=30
    )
)
@settings(max_examples=20, deadline=None)
def test_dup_ngram_ratio_bounds_and_invariance(words):
    """Pure-python replay of dup_ngram_ratio's definition: bounds hold, and
    duplicating the whole document pushes the dup-word ratio up (never
    down). Exercises the exact formula the Column expression implements."""
    def ratio(tokens, n):
        grams = [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)] \
            if len(tokens) >= n else []
        return 0.0 if not grams else 1.0 - len(set(grams)) / len(grams)

    for n in (1, 2, 3):
        r = ratio(words, n)
        assert 0.0 <= r < 1.0 or r == 0.0
    if words:
        assert ratio(words * 2, 1) >= ratio(words, 1)


def test_dup_ngram_ratio_column_matches_python(spark):
    """The Spark expression equals the pure-python definition on a seeded
    batch of random word docs (the hypothesis twin above pins the math;
    this pins the Column translation)."""
    import random

    from albedo_spark.operators.textstats import dup_ngram_ratio

    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("aa bb cc dd ee".split()) for _ in range(rng.randrange(0, 25))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = df.select(
        "doc_id", *[dup_ngram_ratio(F.col("text"), n).alias(f"r{n}") for n in (1, 2, 3)]
    )
    got = {r.doc_id: (r.r1, r.r2, r.r3) for r in out.collect()}

    def ratio(tokens, n):
        grams = [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)] \
            if len(tokens) >= n else []
        return 0.0 if not grams else 1.0 - len(set(grams)) / len(grams)

    for i, text in docs:
        toks = text.split() if text else []
        want = tuple(ratio(toks, n) for n in (1, 2, 3))
        assert got[i] == pytest.approx(want), (i, text)


def test_redact_pii_idempotent(spark):
    """Redaction applied twice equals once (placeholders contain no PII
    shapes), over a seeded mix of clean and dirty rows."""
    from albedo_spark.functions.text import redact_pii

    rows = [
        (1, "a@b.com c@d.org 1.2.3.4 +1-555-1234"),
        (2, "no pii"),
        (3, "<EMAIL> already redacted +9-999-9999"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    once = df.select("id", redact_pii(F.col("text")).alias("t"))
    twice = once.select("id", redact_pii(F.col("t")).alias("t"))
    assert [r.t for r in once.orderBy("id").collect()] == [
        r.t for r in twice.orderBy("id").collect()
    ]


@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=40),
    st.integers(2, 64),
)
@settings(max_examples=8, deadline=None)
def test_pack_sequences_conservation_property(spark, sizes, capacity):
    """Packing invariants for arbitrary doc-size multisets: offsets are the
    exclusive prefix sums, chunks cover every token exactly once (no gaps,
    no padding), and chunk spans are consistent with capacity."""
    from albedo_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tok long"
    )
    rows = sorted(pack_sequences(df, capacity=capacity).collect(),
                  key=lambda r: r.doc_id)
    run = 0
    for r in rows:
        assert r.start_offset == run          # contiguous layout
        run += r.n_tok
        assert r.first_chunk == r.start_offset // capacity
        assert r.last_chunk == (r.start_offset + r.n_tok - 1) // capacity
        assert r.n_chunks == r.last_chunk - r.first_chunk + 1
    assert run == sum(sizes)


@given(st.lists(st.tuples(st.integers(0, 99), st.sampled_from("abc")),
                min_size=1, max_size=60, unique_by=lambda t: t[0]))
@settings(max_examples=8, deadline=None)
def test_snapshot_diff_identity_and_symmetry_property(spark, rows):
    """diff(x, x) is empty; diff(x, y) added/removed swap under argument
    reversal."""
    from albedo_spark.operators.merge import snapshot_diff

    x = spark.createDataFrame(rows, "id long, s string")
    assert snapshot_diff(x, x, ["id"]).count() == 0
    y = spark.createDataFrame(
        [(i + 1, s) for i, s in rows], "id long, s string"
    )
    fwd = {(r.id, r.change_type) for r in snapshot_diff(x, y, ["id"]).collect()}
    rev = {(r.id, r.change_type) for r in snapshot_diff(y, x, ["id"]).collect()}
    swap = {"added": "removed", "removed": "added", "changed": "changed"}
    assert rev == {(i, swap[c]) for i, c in fwd}


@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),                 # key
            st.integers(0, 50),                # start
            st.integers(0, 20),                # length
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=20, deadline=None)
def test_merge_intervals_equals_naive(spark, rows):
    """Random interval sets: the windowed gaps-and-islands result must
    equal a naive per-key union, outputs must be disjoint per key, and
    n_intervals must conserve the input count."""
    from albedo_spark.operators.sessions import merge_intervals

    iv = [(k, s, s + ln) for k, s, ln in rows]
    df = spark.createDataFrame(iv, "user_id long, start_us long, end_us long")
    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_intervals)
        for r in merge_intervals(df).collect()
    )

    # naive union per key (touching intervals merge)
    expected = []
    for k in {k for k, _, _ in iv}:
        mine = sorted((s, e) for kk, s, e in iv if kk == k)
        merged = []
        for s, e in mine:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e), merged[-1][2] + 1)
            else:
                merged.append((s, e, 1))
            merged[-1] = (merged[-1][0], merged[-1][1], merged[-1][2])
        expected.extend((k, s, e, n) for s, e, n in merged)
    assert got == sorted(expected)
    # disjoint + count conservation
    assert sum(n for _, _, _, n in got) == len(iv)
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, s, e, _ in got:
        by_key.setdefault(k, []).append((s, e))
    for spans in by_key.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # strictly disjoint (touching would have merged)


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3600),
                  st.integers(-500, 500)),
        min_size=2, max_size=30, unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(max_examples=15, deadline=None)
def test_rolling_zscore_matches_naive(spark, rows):
    """Random (key, second-offset, value) series: the windowed
    integer-moment z-score must match a pure-Python replay of the same
    fixed-point arithmetic."""
    import datetime as dt
    import math

    from albedo_spark.operators.quality import rolling_zscore

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, k, t0 + dt.timedelta(seconds=s), v / 10.0)
        for i, (k, s, v) in enumerate(rows)
    ]
    e = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {r.event_id: (r.n_window, r.z_x100)
           for r in rolling_zscore(e, window_seconds=600).collect()}

    for i, (k, s, v) in enumerate(rows):
        frame = [
            math.floor((v2 / 10.0) * 10_000 + 0.5)
            for (k2, s2, v2) in rows
            if k2 == k and s - 600 <= s2 <= s
        ]
        n = len(frame)
        s1, s2_ = sum(frame), sum(x * x for x in frame)
        mean = s1 / n
        var = s2_ / n - mean * mean
        vv = math.floor((v / 10.0) * 10_000 + 0.5)
        z = (vv - mean) / math.sqrt(var) if (n > 1 and var > 0) else 0.0
        assert got[i] == (n, math.floor(z * 100 + 0.5)), (i, rows)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 6)),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=15, deadline=None)
def test_cooccurrence_symmetry_and_bounds(spark, rows):
    """Both directions of every pair appear with identical n_both/cosine,
    and cosine never exceeds 1 (10000 integerized)."""
    from albedo_spark.operators.cooccur import cooccurrence_topk

    df = spark.createDataFrame(rows, "b long, i long")
    got = {
        (r.item_a, r.item_b): (r.n_both, r.cosine_x10k)
        for r in cooccurrence_topk(df, "b", "i", k=100).collect()
    }
    for (a, b), (n, c) in got.items():
        assert got[(b, a)] == (n, c)
        assert 0 < c <= 10_000


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1, max_size=12,
    ),
    st.integers(1, 6),
)
@settings(max_examples=10, deadline=None)
def test_bpe_trainer_and_apply_match_pure_python(spark, corpus_words, n_merges):
    """End-to-end BPE invariant on random corpora: (1) the Spark
    pair-delta trainer produces exactly the merges a pure-Python replay
    of the algorithm produces (count desc, (l, r) lex tiebreak, greedy
    non-overlapping re-segment), and (2) rank-order APPLICATION
    (segment_vocab) of those merges to every training word lands on the
    trainer's own final segmentation — apply == train, the property every
    shipped tokenizer depends on."""
    from collections import Counter

    from albedo_spark.operators.bpe import learn_bpe, segment_vocab

    # ---- pure-Python replay of the trainer ----
    vocab = Counter(corpus_words)
    syms = {w: list(w) for w in vocab}

    def pair_stats():
        c = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                c[(a, b)] += f
        return c

    def fold(s, left, right):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    expected_merges = []
    for _ in range(n_merges):
        stats = pair_stats()
        if not stats:
            break
        (left, right), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        expected_merges.append((left, right, n))
        for w in syms:
            syms[w] = fold(syms[w], left, right)

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus_words)],
        "doc_id long, text string",
    )
    got_merges = learn_bpe(docs, n_merges=n_merges)
    assert got_merges == expected_merges

    # ---- apply == train ----
    words_df = spark.createDataFrame(
        [(w,) for w in vocab], "word string"
    )
    applied = {
        r.word: list(r.symbols)
        for r in segment_vocab(words_df, got_merges).collect()
    }
    assert applied == syms


@given(
    st.lists(
        st.lists(
            st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
            min_size=6, max_size=6,
        ),
        min_size=1, max_size=8,
    ),
    st.integers(0, 1000),
)
@settings(max_examples=10, deadline=None)
def test_random_project_matches_sequential_python_replay(spark, vecs, seed):
    """Bit-reproducibility pin for the JL projection: the engine's ordered
    aggregate fold must equal a pure-Python left-to-right float64 fold
    EXACTLY (==, not approx) — the property the q115 oracle relies on.
    A pairwise/SIMD summation sneaking into the fold breaks this."""
    from albedo_spark.operators.similarity import random_project, rp_sign_matrix

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: list(r.projected)
        for r in random_project(df, 6, 4, seed=seed).collect()
    }
    signs = rp_sign_matrix(6, 4, seed)
    for i, v in rows:
        for j in range(4):
            acc = 0.0
            for x, s in zip(v, signs[j]):
                acc = acc + (x * s)   # strict left-to-right IEEE order
            assert got[i][j] == acc, (i, j, got[i][j], acc)
