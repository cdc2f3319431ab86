"""Sequence packing + distributed prefix sum (operators/packing.py),
mixture sampling (operators/sampling.py), BPE pair counts (operators/bpe.py)."""

from pyspark.sql import functions as F

from albedo_spark.operators.packing import global_cumsum, pack_sequences


def test_global_cumsum_matches_serial(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.cs
        for r in global_cumsum(df, "id", "v", out_col="cs").collect()
    }
    run = 0
    for i, v in rows:
        assert got[i] == run, f"id {i}: {got[i]} != {run}"
        run += v


def test_global_cumsum_inclusive_and_partitioning_invariance(spark):
    rows = [(i, i) for i in range(1, 51)]
    df = spark.createDataFrame(rows, "id long, v long")
    for nparts in (1, 3, 16):
        got = {
            r.id: r.cs
            for r in global_cumsum(
                df, "id", "v", out_col="cs", exclusive=False,
                num_partitions=nparts,
            ).collect()
        }
        assert got == {i: i * (i + 1) // 2 for i in range(1, 51)}, nparts


def test_pack_sequences_layout(spark):
    # capacity 10; docs of 4, 8, 10, 3 tokens in id order
    df = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 10), (4, 3), (5, 0)], "doc_id long, n_tok long"
    )
    got = {
        r.doc_id: (r.start_offset, r.first_chunk, r.last_chunk, r.n_chunks)
        for r in pack_sequences(df, capacity=10).collect()
    }
    assert got == {
        1: (0, 0, 0, 1),    # [0,4) inside chunk 0
        2: (4, 0, 1, 2),    # [4,12) straddles 0->1
        3: (12, 1, 2, 2),   # [12,22) straddles 1->2
        4: (22, 2, 2, 1),   # [22,25) inside chunk 2
    }  # doc 5: zero tokens -> dropped


def test_pack_total_tokens_conserved(spark):
    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(100)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(df, capacity=16)
    total = df.agg(F.sum("n_tok")).collect()[0][0]
    # last doc's end offset == total token count (no gaps, no padding)
    last = packed.orderBy(F.col("doc_id").desc()).first()
    assert last.start_offset + last.n_tok == total


def test_mixture_sample_hits_target_and_keeps_binding_stratum(spark):
    from albedo_spark.operators.sampling import mixture_sample

    rows = [(i, "a") for i in range(600)] + \
           [(i + 1000, "b") for i in range(300)] + \
           [(i + 2000, "c") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string")
    # target a:b:c = 1:1:1 -> c (scarcest per weight) kept whole,
    # a and b downsampled to ~100 each
    out = mixture_sample(df, "src", {"a": 1, "b": 1, "c": 1}, key_col="id")
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["c"] == 100                     # binding stratum whole
    assert abs(counts["a"] - 100) <= 25           # hash-sample tolerance
    assert abs(counts["b"] - 100) <= 25
    # deterministic: rerun identical
    again = mixture_sample(df, "src", {"a": 1, "b": 1, "c": 1}, key_col="id")
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())
    # strata outside the weight map are dropped
    out2 = mixture_sample(df, "src", {"a": 1, "b": 2}, key_col="id")
    assert out2.where(F.col("src") == "c").count() == 0


def test_mixture_sample_no_driver_collect_plan(spark):
    # The rate computation must stay inside the plan: counts agg +
    # broadcast join, no Python evaluation anywhere.
    from albedo_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, src string")
    out = mixture_sample(df, "src", {"a": 1, "b": 1}, key_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_pair_counts(spark):
    from albedo_spark.operators.bpe import pair_counts, word_frequencies

    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "ab cd")], "doc_id long, text string"
    )
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf == {"abab": 1, "ab": 2, "cd": 1}
    pc = {r.pair: r.n for r in pair_counts(word_frequencies(docs)).collect()}
    # 'abab' contributes ab,ba,ab once; 'ab' (freq 2) contributes ab twice
    assert pc == {"ab": 4, "ba": 1, "cd": 1}


def test_bpe_single_char_and_empty_words_ignored(spark):
    from albedo_spark.operators.bpe import top_pairs

    docs = spark.createDataFrame(
        [(1, "a b c xy"), (2, "   "), (3, None)], "doc_id long, text string"
    )
    got = [(r.pair, r.n) for r in top_pairs(docs, k=5).collect()]
    assert got == [("xy", 1)]


def test_chunk_documents_window_layout(spark):
    from albedo_spark.operators.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b"), (3, ""), (4, None)], "doc_id long, text string"
    )
    # chunk_size=4, overlap=2 -> stride 2; n=10 -> k_max=ceil(6/2)=3, 4 chunks
    got = {
        (r.doc_id, r.chunk_id): (r.n_chunks, r.chunk_text, r.chunk_tokens)
        for r in chunk_documents(docs, chunk_size=4, overlap=2).collect()
    }
    assert got[(1, 0)] == (4, "w0 w1 w2 w3", 4)
    assert got[(1, 1)] == (4, "w2 w3 w4 w5", 4)
    assert got[(1, 2)] == (4, "w4 w5 w6 w7", 4)
    assert got[(1, 3)] == (4, "w6 w7 w8 w9", 4)   # covers the end exactly
    assert got[(2, 0)] == (1, "a b", 2)           # short doc: single chunk
    assert set(d for d, _ in got) == {1, 2}       # empty/null dropped


def test_chunk_documents_no_degenerate_tail(spark):
    from albedo_spark.operators.packing import chunk_documents

    # n=9, chunk=4, stride=2 -> k_max=ceil(5/2)=3; last chunk [6..9] has 3
    # tokens and covers token 9; a naive k<ceil(n/stride) rule would emit a
    # 5th chunk fully inside the 4th.
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(9)))], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_size=4, overlap=2).collect()
    assert len(rows) == 4
    last = max(rows, key=lambda r: r.chunk_id)
    assert last.chunk_text == "w6 w7 w8" and last.chunk_tokens == 3


def test_rolling_fingerprint_order_sensitive(spark):
    from albedo_spark.operators.textstats import (
        ROLLING_B,
        ROLLING_M,
        rolling_hash_fingerprint,
    )
    import hashlib

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma"),
         (4, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", rolling_hash_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    # serial replay
    def fold(text):
        h = 0
        for t in text.split():
            u = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % ROLLING_M
            h = (h * ROLLING_B + u) % ROLLING_M
        return h

    assert got[1] == fold("alpha beta gamma")
    assert got[2] == fold("gamma beta alpha")
    assert got[1] != got[2]      # order-sensitive
    assert got[1] == got[3]      # deterministic
    assert got[4] == 0           # empty -> 0


def test_hopping_agg_covering_windows(spark):
    import datetime as dt
    from albedo_spark.operators.sessions import hopping_agg

    # one event at 00:20 -> windows starting 23:30, 23:45, 00:00, 00:15
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 2, 0, 20), "click", 3.0)],
        "ts timestamp, event_type string, value double",
    )
    got = sorted(
        r.window_start for r in hopping_agg(df).collect()
    )
    assert [g.strftime("%H:%M") for g in got] == ["23:30", "23:45", "00:00", "00:15"]


def test_weighted_sample_without_replacement(spark):
    from albedo_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )
    import hashlib, math

    rows = [(i, float((i % 10) + 1)) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in
           weighted_sample_without_replacement(df, "w", 50, "id").collect()]
    assert len(got) == len(set(got)) == 50      # without replacement
    # deterministic serial replay of the E-S keys
    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1) / (2**32 + 1)
        return math.log(u) / w
    expect = sorted(rows, key=lambda r: (-key(*r), r[0]))[:50]
    assert sorted(got) == sorted(i for i, _ in expect)
    # weight bias: the top-weight stratum (w=10) should out-represent w=1
    w_of = dict(rows)
    assert sum(1 for i in got if w_of[i] == 10.0) > sum(1 for i in got if w_of[i] == 1.0)
    # zero/negative weights excluded
    df2 = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "id long, w double")
    assert [r.id for r in
            weighted_sample_without_replacement(df2, "w", 10, "id").collect()] == [3]


def test_weighted_sample_plan_is_take_ordered(spark):
    from albedo_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    out = weighted_sample_without_replacement(df, "w", 10, "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan   # heap top-k, never a full sort


def test_global_cumsum_negative_values(spark):
    """Bucket totals are per-bucket SUMS, so any-sign values stay exact
    (r5 ADVICE: max(_local) equalled the total only for non-negative
    value columns)."""
    rows = [(i, ((i * 7) % 5) - 2) for i in range(1, 101)]  # values in [-2, 2]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.cs
        for r in global_cumsum(
            df, "id", "v", out_col="cs", num_partitions=8
        ).collect()
    }
    run = 0
    for i, v in rows:
        assert got[i] == run, f"id {i}: {got[i]} != {run}"
        run += v


def test_learn_bpe_sennrich_example(spark):
    """The classic BPE walkthrough corpus: merges and counts are
    hand-checkable, including the count-9 tie resolved lexicographically
    and greedy non-overlapping replacement."""
    from albedo_spark.operators.bpe import learn_bpe

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=3)
    # e-s and s-t both count 9 -> ('e','s') wins the lex tiebreak; after
    # es, (es,t) is 9; then l-o / o-w tie at 7 -> ('l','o')
    assert merges == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7)]


def test_learn_bpe_greedy_nonoverlap(spark):
    from albedo_spark.operators.bpe import learn_bpe

    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    # 'aaa': pairs (a,a) x2 per word occurrence -> weight 2*2=4; merge
    # gives [aa, a] (greedy, non-overlapping), so round 2's best is
    # (aa, a) with weight 2
    merges = learn_bpe(docs, n_merges=2)
    assert merges == [("a", "a", 4), ("aa", "a", 2)]


def test_segment_vocab_rank_order_apply(spark):
    """Applying the Sennrich merges reproduces the hand-checkable
    segmentation, including for a word NOT in the training corpus
    ('lowest') — the apply side replays training's global rank order."""
    from albedo_spark.operators.bpe import learn_bpe, segment_vocab

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=3)  # (e,s), (es,t), (l,o)
    vocab = spark.createDataFrame(
        [("lowest",), ("low",), ("newest",)], "word string"
    )
    got = {r.word: list(r.symbols) for r in segment_vocab(vocab, merges).collect()}
    assert got == {
        "lowest": ["lo", "w", "est"],
        "low": ["lo", "w"],
        "newest": ["n", "e", "w", "est"],
    }


def test_segment_vocab_matches_trainer_state(spark):
    """Apply == train on the training corpus itself: the rank-order apply
    loop must land on the same symbols the trainer's greedy folds reached
    (the run-of-a's case where naive left-to-right application of rules
    in sequence order would also work, plus the chained-merge case)."""
    from albedo_spark.operators.bpe import learn_bpe, segment_vocab

    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges = learn_bpe(docs, n_merges=2)
    vocab = spark.createDataFrame([("aaa",), ("aaaa",)], "word string")
    got = {r.word: list(r.symbols) for r in segment_vocab(vocab, merges).collect()}
    # 'aaa': (a,a) greedy -> [aa, a]; then (aa,a) -> [aaa]
    # 'aaaa' (unseen): (a,a) greedy -> [aa, aa]; (aa,aa) unlearned
    assert got == {"aaa": ["aaa"], "aaaa": ["aa", "aa"]}


def test_encode_corpus_order_and_counts(spark):
    from albedo_spark.operators.bpe import encode_corpus, learn_bpe

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    train = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = learn_bpe(train, n_merges=3)
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: (list(r.tokens), r.n_tokens)
           for r in encode_corpus(docs, merges).collect()}
    assert out == {
        1: (
            ["lo", "w", "lo", "w", "e", "r", "n", "e", "w", "est"],
            10,
        )
    }  # NULL-text doc carries no tokens and is not emitted


def test_temperature_mixture_sqrt_rebalance(spark):
    from albedo_spark.operators.sampling import temperature_mixture

    rows = (
        [(i, "big") for i in range(1600)]
        + [(i + 10000, "mid") for i in range(400)]
        + [(i + 20000, "small") for i in range(100)]
        + [(90000, None)]
    )
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_mixture(df, "src", key_col="id", sqrt_iters=1)
    counts = {
        r.src: r.n
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # kept sizes ∝ sqrt(c): small whole (100), mid ≈ sqrt(100*400)=200,
    # big ≈ sqrt(100*1600)=400
    assert counts["small"] == 100
    assert abs(counts["mid"] - 200) <= 30
    assert abs(counts["big"] - 400) <= 45
    assert None not in counts  # NULL strata dropped
    # deterministic replay
    again = temperature_mixture(df, "src", key_col="id", sqrt_iters=1)
    assert sorted(r.id for r in out.collect()) == sorted(
        r.id for r in again.collect()
    )
    # α = 1/4 (two nested sqrts) flattens harder: kept_big/kept_small
    # drops from 4x toward 16^(1/4)=2x
    out4 = temperature_mixture(df, "src", key_col="id", sqrt_iters=2)
    c4 = {
        r.src: r.n
        for r in out4.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert c4["small"] == 100
    assert c4["big"] < counts["big"]
    assert abs(c4["big"] - 200) <= 35


def test_temperature_mixture_stays_in_plan(spark):
    from albedo_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, src string")
    out = temperature_mixture(df, "src", key_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_plan_arithmetic(spark):
    """Exact integer shares: weights 3:1 over a 1200-token budget give
    900/300 targets; epochs reflect repeat factors; zero-token and
    unweighted strata drop out."""
    from albedo_spark.operators.sampling import epoch_plan

    df = spark.createDataFrame(
        [
            ("a", 450), ("a", 0),       # a: 450 tokens -> target 900 -> 2.0 epochs
            ("b", 600),                 # b: 600 tokens -> target 300 -> 0.5 epochs
            ("c", 100),                 # not in weights -> excluded
            ("d", 0),                   # zero tokens -> excluded (no div0)
        ],
        "lang string, n_tokens long",
    )
    got = {
        r.lang: (r.n_tokens, r.weight, r.target_tokens, r.epochs_x10k)
        for r in epoch_plan(df, "lang", {"a": 3, "b": 1}, 1200).collect()
    }
    assert got == {"a": (450, 3, 900, 20000), "b": (600, 1, 300, 5000)}
    # a configured-but-empty stratum keeps its weight in the denominator:
    # its share of the budget is deliberately left unassigned, not
    # silently redistributed (the mixture is the CONFIGURED one)
    got2 = {
        r.lang: r.target_tokens
        for r in epoch_plan(df, "lang", {"a": 3, "b": 1, "d": 1}, 1200).collect()
    }
    assert got2 == {"a": 720, "b": 240}


def test_segment_vocab_equals_sequential_replay(spark):
    """The q126 oracle equivalence: on a CONSISTENT merge table (every
    non-initial symbol produced by an earlier merge), rank-priority
    application (segment_vocab) equals sequential replace-all in merge
    order — a merge can only create pairs involving its new symbol, and
    that symbol cannot appear in any earlier-rank pair."""
    from albedo_spark.operators.bpe import segment_vocab
    from albedo_spark.queries import _BPE_APPLY_MERGES

    def sequential(word):
        syms = list(word)
        for left, right in _BPE_APPLY_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = [
        "then", "the", "and", "thth", "anan", "store", "internet",
        "error", "attention", "oregon", "renderer", "ananas", "x",
        "thethe", "standard", "orientation",
    ]
    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: list(r.symbols)
        for r in segment_vocab(vocab, _BPE_APPLY_MERGES).collect()
    }
    assert got == {w: sequential(w) for w in words}


def test_bpe_oracle_chain_reaches_fixed_point():
    """The OTHER half of the q126 equivalence (the round-8 advisor
    finding): the DuckDB sentinel-replace chain must match sequential
    replace-all even on BACK-TO-BACK pair occurrences, where a single
    replace pass consumes the shared ¤ and skips the second occurrence.
    Runs the actual _bpe_replace_chain() SQL in DuckDB against the
    Python replay on the planted adversarial words plus long runs."""
    import duckdb

    from albedo_spark.queries import _BPE_APPLY_MERGES, _BPE_PLANT, _bpe_replace_chain

    def sequential(word):
        syms = list(word)
        for left, right in _BPE_APPLY_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = _BPE_PLANT.split() + [
        "ththththththth", "in" * 40, "an" * 33, "the" * 25, "at" * 50,
        "inaninanin", "thathathath", "andandand",
    ]
    con = duckdb.connect()
    chain = _bpe_replace_chain()
    for w in words:
        got = con.sql(
            f"SELECT trim({chain}, '¤') FROM (SELECT '{w}' AS word)"
        ).fetchone()[0].split("¤")
        assert got == sequential(w), w


def test_content_defined_chunks_reassemble_exactly(spark):
    from albedo_spark.operators.packing import content_defined_chunks

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "one"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = content_defined_chunks(df, divisor=4).collect()
    got: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        got.setdefault(r.doc_id, []).append(r)
    for i, text in rows:
        toks = text.split()
        rs = got[i]
        assert [r.chunk_id for r in rs] == list(range(len(rs)))
        assert " ".join(r.chunk_text for r in rs) == " ".join(toks)
        assert sum(r.n_tokens for r in rs) == len(toks)


def test_content_defined_chunks_stable_under_prefix_insertion(spark):
    from albedo_spark.operators.packing import content_defined_chunks

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi"
    df = spark.createDataFrame(
        [(1, base), (2, "inserted preface words here " + base)],
        "doc_id long, text string",
    )
    out = content_defined_chunks(df, divisor=4).collect()
    sigs = {1: [], 2: []}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        sigs[r.doc_id].append(r.chunk_text)
    # content-defined boundaries: every chunk after the first boundary in
    # the unmodified suffix is IDENTICAL text (the dedup-survives-edits
    # property; fixed windows would re-cut everything)
    common = set(sigs[1]) & set(sigs[2])
    assert len(common) >= len(sigs[1]) - 2
    # and doc 2's tail chunks literally equal doc 1's tail chunks
    k = min(len(sigs[1]), len(sigs[2])) - 1
    assert k >= 1 and sigs[1][-k:] == sigs[2][-k:]


def test_content_defined_chunks_divisor_one_is_per_token(spark):
    from albedo_spark.operators.packing import content_defined_chunks

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = sorted(
        content_defined_chunks(df, divisor=1).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_text for r in out] == ["a", "b", "c", "d"]


def test_text_tiling_detects_topic_shift(spark):
    from albedo_spark.operators.packing import text_tiling_boundaries

    topic_a = "cat dog bird fish lion tiger bear wolf fox deer owl bat rat cow pig hen"
    topic_b = "sql join index query table column schema view trigger cursor plan lock row page log disk"
    doc = topic_a + " " + topic_a + " " + topic_b + " " + topic_b
    short = "too short to segment"
    df = spark.createDataFrame([(1, doc), (2, short)], "doc_id long, text string")
    rows = sorted(
        text_tiling_boundaries(df, block_tokens=16, threshold_x10k=3000).collect(),
        key=lambda r: (r.doc_id, r.pair_idx),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # under two blocks -> nothing to segment
    sims = [r.sim_x10k for r in by_doc[1]]
    # pairs: (a,a) identical -> 10000; (a,b) disjoint topics -> 0; (b,b) -> 10000
    assert sims == [10000, 0, 10000]
    assert [r.is_boundary for r in by_doc[1]] == [False, True, False]
