"""Text-analysis operators for training-data pipelines (north-star
extension; generalizes the reference's tokenizer/stopword stages M9/M10,
``S/transformers/HanLPTokenizer.scala``, ``S/transformers/SnowballStemmer.scala``).

All pure Column expressions — these run over every document of a 100 TB
corpus, so nothing here leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.dedup import normalize_text

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small + frozen: they are part of the operator's
# deterministic contract (the oracle recomputes the identical scores).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "para", "en", "que", "no"),
}

_CJK_PATTERN = r"[\p{InCJKUnifiedIdeographs}\p{InHiragana}\p{InKatakana}]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (empty text → empty array)."""
    t = normalize_text(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, " "))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: split on whitespace AND on transitions
    between letters/digits/punctuation (a cheap BPE proxy — the usual
    ~chars/4 heuristic is worse on code-like text)."""
    pieces = F.regexp_extract_all(
        F.lower(col), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1
    )
    return F.size(pieces)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (0.0 for empty)."""
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    tok = tokens(col)
    n = F.size(tok)
    hits = F.size(F.filter(tok, lambda t: F.array_contains(stops, t)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Punctuation characters / total characters (0.0 for empty)."""
    n = F.length(col)
    punct = n - F.length(F.regexp_replace(col, r"""[!-/:-@\[-`{-~]""", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def quality_score_raw(col: Column) -> Column:
    """Unrounded composite document-quality score in [0, 1]:
    0.4·length-band + 0.3·(1-punct_ratio) + 0.3·min(1, 5·stopword_ratio_en).

    Deterministic, explainable, and cheap — the standard pre-filter shape
    (C4/Gopher-style heuristics) without model inference.
    """
    n_tok = token_count(col)
    length_band = F.when((n_tok >= 20) & (n_tok <= 10000), F.lit(1.0)).otherwise(
        F.when(n_tok > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    sw = stopword_ratio(col, "en")
    return (
        0.4 * length_band
        + 0.3 * (1.0 - punct_ratio(col))
        + 0.3 * F.least(F.lit(1.0), 5.0 * sw)
    )


def quality_score(col: Column) -> Column:
    return F.round(quality_score_raw(col), 4)


def quality_score_x10k(col: Column) -> Column:
    """Integer-scaled score (×10000): ``floor(raw·10⁴ + 0.5)`` — the
    engine-portable form. round() disagrees across engines on half-boundary
    doubles (Spark rounds the shortest decimal repr, DuckDB multiplies
    first); an explicit multiply+floor is the same IEEE op sequence
    everywhere."""
    return F.floor(quality_score_raw(col) * 10000.0 + 0.5).cast("long")


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK-script detection first, else the language
    whose stopword-hit count is highest (ties → lexicographic language code,
    no hits → 'und'). Deterministic; the DuckDB oracle replays it exactly."""
    tok = tokens(col)

    def stop_hits(stop_list: tuple[str, ...]):
        arr = F.array(*[F.lit(s) for s in stop_list])
        return F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))

    scores = [(lang, stop_hits(ss)) for lang, ss in sorted(LANG_STOPWORDS.items())]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # Fold left in lexicographic order; strict '>' keeps the earliest max.
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    has_cjk = F.length(F.regexp_replace(col, f"[^{_CJK_PATTERN[1:-1]}]", "")) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(best_lang)


from albedo_spark.functions.arrays import bind as _bind  # noqa: E402


def _ngrams_of(t: Column, n: int) -> Column:
    """n-grams from an already-BOUND token array variable ``t``."""
    if n == 1:
        return t
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + F.lit(j) + 1) for j in range(n)]
    )
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(0), F.size(t) - n), gram)
    )


def ngrams(tok: Column, n: int) -> Column:
    """Word n-grams of a token array (space-joined; fewer than n tokens →
    empty array). Pure HOF — no explode; the input expression is bound
    once per row regardless of how many times the gram builder reads it."""
    return _bind(tok, lambda t: _ngrams_of(t, n))


def dup_ngram_ratio(col: Column, n: int) -> Column:
    """Fraction of word n-grams that are repeats of an earlier one —
    1 - distinct/total (0.0 for empty). The repetition family of quality
    filters from the Gopher corpus analysis (Rae et al. 2021, published
    description): heavily templated / looping documents score high and
    get dropped before training. n=1 is word repetition, n=2/3 phrase
    repetition. Token and gram arrays are each evaluated once per row
    (``_bind``)."""
    return _bind(
        tokens(col),
        lambda t: _bind(
            _ngrams_of(t, n),
            lambda g: F.when(F.size(g) <= 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct(g)) / F.size(g)
            ),
        ),
    )


def repetition_signals(col: Column) -> list[Column]:
    """The per-document repetition profile as x10k integer-scaled columns
    (engine-portable, cf. ``quality_score_x10k``)."""
    return [
        F.floor(dup_ngram_ratio(col, n) * 10000.0 + 0.5)
        .cast("long")
        .alias(f"dup_{name}_x10k")
        for n, name in ((1, "word"), (2, "bigram"), (3, "trigram"))
    ]


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of sorted distinct tokens — robust to token
    order and duplication (the 'fingerprint' of Broder's shingling family;
    cheap canonical identity for clustering/dedup joins)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


# Rabin-Karp rolling-hash parameters: base/modulus sized so the fold
# `h*B + t` never leaves int64 (h < M ~ 1e9, t < M, so h*B + t < 1.4e11).
ROLLING_B = 131
ROLLING_M = 1_000_000_007


def rolling_hash_fingerprint(col: Column) -> Column:
    """ORDER-SENSITIVE document fingerprint: Rabin-Karp polynomial hash of
    the token stream, ``h = fold(h * B + md5_u32(token) mod M)`` — the
    rolling-hash identity of content-defined chunking / winnowing
    families. Unlike ``fingerprint`` (sorted-set identity), two documents
    with the same words in different order hash differently.

    Pure higher-order ``F.aggregate`` fold — JVM-side, shuffle-free, one
    pass over the token array. Token hashes use the catalog's portable
    md5-u32 rule so an external engine replays the fold exactly in
    integer arithmetic (no float anywhere). Empty/blank text folds over
    the empty array and yields 0.
    """
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda h, t: (h * ROLLING_B + (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % ROLLING_M
        )) % ROLLING_M,
    )


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per-document overlap with a probe set's
    word n-grams → (id, n_hits, n_grams, contaminated_x10k fraction).
    The standard pre-training hygiene step — documents sharing enough
    n-grams with an evaluation benchmark are quarantined so the benchmark
    stays out of the training set.

    Scale design (single-pass per VERDICT r5 #2, superseding the r4
    two-branch form): probe n-grams are distinct-ed and BROADCAST
    (benchmark suites are tiny next to a corpus); the corpus is scanned
    ONCE — grams computed once per doc, ``size`` and the explode both
    derived from that single projection — then a LEFT broadcast-mark
    join tags hits and ONE ``groupBy (id, n_grams)`` produces numerator
    and denominator together. Non-matching grams still die map-side:
    the broadcast probe and the PARTIAL hash aggregate both run inside
    the scan stage, collapsing every document to one 3-int row BEFORE
    the exchange, so the shuffle carries |docs| rows — never
    scan x gram-multiplicity — while the r4 form's second corpus scan
    and doc-keyed stitch join are gone entirely (r5 measured ~16%
    faster warm at sf0.1, identical hashes). Pinned by
    tests/test_functions.py::test_contamination_plan_broadcasts_probes
    (single doc scan, broadcast probe side, partial agg below the
    exchange, no second join).
    """
    from pyspark.sql import functions as _F

    def distinct_grams(col):
        return _F.array_distinct(ngrams(tokens(col), n))

    probe_grams = (
        probes.select(_F.explode(distinct_grams(_F.col(text_col))).alias("gram"))
        .distinct()
        .withColumn("_hit", _F.lit(1))
    )
    from albedo_spark.io import widen as _widen

    exploded = _widen(
        docs.select(_F.col(id_col), _F.col(text_col))
    ).select(
        _F.col(id_col), distinct_grams(_F.col(text_col)).alias("_g")
    ).select(
        id_col,
        _F.size("_g").alias("n_grams"),
        # explode_outer keeps gram-less docs (NULL gram never matches a
        # probe), so the zero-hit denominator needs no second pass
        _F.explode_outer("_g").alias("gram"),
    )
    agg = (
        exploded.join(_F.broadcast(probe_grams), "gram", "left")
        .groupBy(id_col, "n_grams")
        .agg(_F.sum(_F.coalesce(_F.col("_hit"), _F.lit(0))).alias("n_hits"))
    )
    ratio = _F.when(
        _F.col("n_grams") > 0, _F.col("n_hits") / _F.col("n_grams")
    ).otherwise(_F.lit(0.0))
    return agg.select(
        id_col,
        "n_hits",
        "n_grams",
        _F.floor(ratio * 10000.0 + 0.5).cast("long").alias("contaminated_x10k"),
    )


def hashed_tf_features(
    docs,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Hashing-trick document featurizer (the scalable, vocabulary-free
    bag-of-words embedding): each token hashes into one of ``dim``
    buckets via the portable md5-u32 rule, per-bucket counts are
    L2-normalized, and the output is LONG format ``(id, dim_idx,
    weight_x1m)`` — ready to pivot into a dense vector for the kNN/ANN
    operators or to feed a linear model directly.

    Plan: explode tokens → one (doc, bucket) hash aggregate → window-sum
    the squared counts per doc for the norm (tiny groups: ≤ dim rows per
    doc). No vocabulary broadcast, no fitting pass — the property that
    lets it run on an unbounded corpus. Weights integerized
    (``floor(c·10⁶/‖c‖ + 0.5)``) so any engine replays the exact values.
    """
    from pyspark.sql import Window

    from albedo_spark.io import widen as _widen

    tok = _widen(
        docs.where(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
        ).select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
        % dim
    )
    counts = (
        tok.select(id_col, bucket.alias("dim_idx"))
        .groupBy(id_col, "dim_idx")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy(id_col)
    norm = F.sqrt(F.sum(F.col("c") * F.col("c")).over(w))
    return counts.select(
        id_col,
        "dim_idx",
        F.floor(F.col("c") * F.lit(1_000_000.0) / norm + F.lit(0.5))
        .cast("long")
        .alias("weight_x1m"),
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Statistical-LM quality score per document — the perplexity-filter
    stage of CCNet-style pipelines (Wenzek et al. 2020 score with a KenLM
    n-gram model; public method) reduced to a corpus-self-trained bigram
    model with add-one smoothing: a document whose adjacent-token
    transitions are common across the corpus scores high, gibberish and
    shuffled text score low. Output ``(id, n_bigrams, score_x10k)`` with
    ``score_x10k = floor(avg_bigram_probability × 10^4)``; docs with
    fewer than two tokens carry NULL score (no transitions to judge).

    Every arithmetic step is INTEGER-exact so the DuckDB oracle replays
    bit-for-bit (the q101 discipline, avoiding the cross-engine 1-ulp
    hazard a transcendental log would introduce): per-bigram smoothed
    probability ``(C(w1,w2)+1) / (C(w1)+V)`` is integerized as a single
    BIGINT floor-division at ×10^9, summed exactly, then one more
    floor-division produces the ×10^4 average. Production callers wanting
    true log-perplexity can apply ``ln`` to the same joined counts — the
    plan is identical, only the final projection changes.

    Plan shape at 100 TB: one tokenization per doc (array column), bigram
    explode via the zip-of-slices HOF; unigram and bigram count tables
    are classic map-side-combinable aggregates; the per-doc score is two
    equi-joins (bigram stats on (w1,w2), unigram stats on w1 — both
    AQE-broadcastable when vocabulary is small relative to corpus) and
    one per-doc aggregate. The vocabulary size V rides a broadcast
    one-row cross join (no driver round-trip — the fully-lazy scalar
    idiom ``dsir_importance_scores`` uses).
    """
    from albedo_spark.io import widen as _widen

    base = _widen(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).localCheckpoint(eager=False)
    uni = (
        base.select(F.explode("_t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("_cu"))
    )
    vocab_size = uni.agg(F.count("*").alias("_v"))
    pairs = base.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_p"),
    ).select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("_cb"))
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            id_col,
            F.expr("(_cb + 1) * 1000000000L DIV (_cu + _v)").alias("_p9"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("_p9").alias("_sp")
    )
    out = agg.select(
        id_col,
        "n_bigrams",
        F.expr("_sp DIV (n_bigrams * 100000L)").alias("score_x10k"),
    )
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "score_x10k",
        )
    )


def dsir_importance_scores(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data-selection importance scores (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public method; their hashed-n-gram distribution ratio re-expressed
    with explicit bigram tables): each document scores by how much more
    likely its token transitions are under the TARGET subcorpus than
    under the whole corpus. Documents resembling the target domain score
    above 10^4 (ratio > 1), off-domain documents below. The selection
    stage between hygiene and mixture sampling: rank by score, keep the
    head, or feed the scores to ``weighted_sample_without_replacement``.

    Per bigram the smoothed frequency ratio is
    ``((Ct+1)·(Nall+B)) / ((Call+1)·(Nt+B))`` — Ct/Call the bigram's
    target/corpus counts, Nt/Nall the total bigram masses, B the distinct
    bigram vocabulary. The ratio is evaluated in ONE double
    multiply-divide chain (every IEEE multiply/divide is correctly
    rounded, so both engines derive the identical double — only
    transcendentals are cross-engine hazards), integerized per row at
    ×10^4, summed exactly as BIGINTs, and floor-divided to the per-doc
    average (the q101 order-independence discipline).

    Plan: two count aggregates (corpus and target bigram tables — the
    target side is usually tiny), scalar masses via a broadcast one-row
    cross join (no driver round-trip), two AQE-broadcastable stat joins,
    one per-doc aggregate. Linear in corpus tokens.
    """
    def bigrams(frame: DataFrame) -> DataFrame:
        return frame.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_t")
        ).select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("_p"),
        ).select(
            id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
        )

    all_pairs = bigrams(docs).localCheckpoint(eager=False)
    call = all_pairs.groupBy("w1", "w2").agg(F.count("*").alias("_call"))
    ct = (
        bigrams(target)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("_ct"))
    )
    masses = (
        call.agg(
            F.sum("_call").alias("_nall"), F.count("*").alias("_b")
        )
        .crossJoin(
            ct.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_nt"))
        )
    )
    scored = (
        all_pairs.join(call, ["w1", "w2"])
        .join(ct, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(masses))
        .select(
            id_col,
            F.floor(
                (
                    (F.coalesce("_ct", F.lit(0)) + F.lit(1)).cast("double")
                    * (F.col("_nall") + F.col("_b")).cast("double")
                )
                / (
                    (F.col("_call") + F.lit(1)).cast("double")
                    * (F.col("_nt") + F.col("_b")).cast("double")
                )
                * F.lit(10_000.0)
            )
            .cast("long")
            .alias("_imp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("_imp").alias("_si")
    )
    out = agg.select(
        id_col,
        "n_bigrams",
        F.expr("_si DIV n_bigrams").alias("importance_x10k"),
    )
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "importance_x10k",
        )
    )


# --- Blocklist / policy filter (training-data pipeline extension) ---------
# The C4-style badwords stage: documents containing blocklisted terms are
# flagged (or dropped) before training. Term matching is word-boundary
# anchored and case-insensitive — 'assess' must not hit a blocklist entry
# 'ass' — and the whole check is ONE alternation regex per document, a
# map-only scan at 100 TB. Regex stays in the Java-regex ∩ RE2 subset
# (the PII_PATTERNS discipline) so the DuckDB oracle counts identically.


def blocklist_pattern(terms: "Sequence[str]") -> str:
    """Case-insensitive word-boundary alternation over ``terms``. Terms
    are regex-escaped (blocklists come from config files, not regex
    authors), and each term carries its own ``\\b`` anchors — only on
    edges that ARE word characters: ``\\b`` is a \\w/\\W transition, so
    anchoring a term like ``c++`` on the right would require a word char
    after the ``+`` and never match. Lookarounds would express "not
    followed by a word char" exactly, but RE2 lacks them (the PII_PATTERNS
    subset rule), so non-word edges go un-anchored — the standard
    compromise."""
    import re as _re2

    if not terms:
        raise ValueError("empty blocklist")

    def _anchored(t: str) -> str:
        left = r"\b" if (t[0].isalnum() or t[0] == "_") else ""
        right = r"\b" if (t[-1].isalnum() or t[-1] == "_") else ""
        return left + _re2.escape(t) + right

    return "(?i)(" + "|".join(_anchored(t) for t in sorted(terms)) + ")"


def blocklist_hits(col: Column, terms: "Sequence[str]") -> Column:
    """Count of blocklisted-term occurrences in ``col`` (long; 0 for
    clean or NULL-safe per Spark regexp semantics)."""
    return F.regexp_count(col, F.lit(blocklist_pattern(terms))).cast("long")


def blocklist_filter(
    docs: DataFrame,
    terms: "Sequence[str]",
    max_hits: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents with at most ``max_hits`` blocklisted occurrences
    (the C4 policy is ``max_hits=0``: any hit drops the doc). A pure
    filter over the one-regex count — predicate-pushdown-friendly,
    no shuffle, no UDF. NULL text carries no content and therefore no
    hits: those rows pass through (the package's exact_dedup precedent —
    a bare ``<=`` on the NULL count would silently drop them)."""
    hits = blocklist_hits(F.col(text_col), terms)
    return docs.where(F.coalesce(hits, F.lit(0)) <= max_hits)


def oov_rate(
    docs: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage per document: with the corpus's ``vocab_size``
    most frequent words as the vocabulary (ties → lexicographic, a
    deterministic total order), report ``(doc_id, n_tokens, n_oov,
    oov_x10k)`` — the fraction of tokens a fixed-size word vocabulary
    would map to <unk>. The go/no-go metric for sizing a tokenizer
    vocabulary against a corpus (high OOV ⇒ grow the vocab or move to
    subwords), and a per-document outlier signal (a doc that is mostly
    OOV against its own corpus is usually junk).

    Plan at 100 TB: one token explode + one (word) shuffle for corpus
    frequencies, top-``vocab_size`` via the pinned window idiom on ONE
    partition of word-count pairs (vocabulary candidates, not corpus
    rows), vocabulary broadcast back onto the token stream, one per-doc
    aggregate. The vocabulary is data-derived but bounded — broadcast is
    by construction ``vocab_size`` rows."""
    from albedo_spark.io import widen as _widen

    toks = _widen(
        docs.where(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
        ).select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_w")
    )
    freq = toks.groupBy("_w").agg(F.count("*").alias("_n"))
    from albedo_spark.operators.topk import global_top_k

    vocab = global_top_k(
        freq, [F.col("_n").desc(), F.col("_w").asc()], vocab_size
    ).select("_w")
    return (
        toks.join(F.broadcast(vocab.withColumn("_in", F.lit(1))), "_w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .withColumn(
            "oov_x10k",
            F.expr("n_oov * 10000 DIV n_tokens"),
        )
    )


#: BIGINT-headroom ceiling for the Kneser–Ney scaled arithmetic: the
#: discounted-mass numerator is ``(4·c12 − 3)·10^6`` and ``c12 ≤ c1``, so
#: every count must stay below 2^63 / (4·10^6) ≈ 2.3·10^12. Past it both
#: engines wrap IDENTICALLY (Spark non-ANSI and DuckDB ``//`` on BIGINT),
#: so the hash gate could never catch the overflow — the lazy raise is
#: the only honest tripwire (the unigram ``_T_CEIL`` discipline).
_KN_CEIL = (1 << 63) // 4_000_000 - 1


def kneser_ney_bigrams(
    docs: DataFrame,
    k: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser–Ney bigram model statistics (Kneser & Ney
    1995; Chen & Goodman 1999 — the standard n-gram smoothing) trained
    on the corpus, reported for the ``k`` most frequent bigrams: the
    stronger sibling of ``bigram_lm_scores``'s add-one model, and the
    model whose CONTINUATION counts are the genuinely distributed part —
    ``n_prec = N1+(·w2)`` (distinct left contexts of w2) is what
    distinguishes KN from every count-ratio smoother, and it is one more
    distinct-aggregate over the bigram-type frame.

    Columns per bigram: ``w1, w2, c12`` (bigram count), ``c1`` (w1's
    left-context mass = Σ_y c(w1,y)), ``n_follow = N1+(w1·)`` (distinct
    followers — the interpolation weight's numerator), ``n_prec``,
    ``bigram_types`` (corpus scalar B), and the absolute-discount d=3/4
    interpolated probability as an exact scaled integer::

        p_kn_ppm = (4·c12 − 3)·10^6 div (4·c1)
                 + ((3·10^6·n_follow) div (4·c1) · n_prec) div B

    i.e. ``max(c12 − 0.75, 0)/c1 + 0.75·(n_follow/c1)·(n_prec/B)`` with
    a FIXED floor-division order both engines replay bit-for-bit
    (truncation order is part of the contract; c12 ≥ 1 makes the max
    vacuous). No float enters the gated surface.

    Plan at 100 TB: one bigram explode (zip-of-slices HOF) + ONE shuffle
    to the bigram-TYPE frame; c1/n_follow and n_prec are two further
    aggregates OF that type frame (|bigram types| rows, not corpus), the
    scalar B rides a broadcast one-row cross join, and the two stat
    joins are AQE-broadcastable. One TakeOrderedAndProject tail.
    """
    from albedo_spark.io import widen as _widen

    base = _widen(docs.select(F.col(text_col))).select(
        tokens(F.col(text_col)).alias("_t")
    )
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    cb = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .select(
            "w1",
            "w2",
            F.when(
                F.col("c12") > F.lit(_KN_CEIL),
                F.raise_error(
                    F.concat(
                        F.lit("kneser_ney_bigrams: count "),
                        F.col("c12").cast("string"),
                        F.lit(
                            f" exceeds the scaled-integer BIGINT headroom"
                            f" ceiling {_KN_CEIL} (both engines would wrap"
                            " identically); shard the corpus"
                        ),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("c12"))
            .alias("c12"),
        )
        .localCheckpoint(eager=False)
    )
    lc = cb.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_follow")
    )
    pc = cb.groupBy("w2").agg(F.count("*").alias("n_prec"))
    bt = cb.agg(F.count("*").alias("bigram_types"))
    scored = (
        cb.join(lc, "w1")
        .join(pc, "w2")
        .crossJoin(F.broadcast(bt))
        .withColumn(
            "p_kn_ppm",
            F.expr(
                "(4 * c12 - 3) * 1000000L div (4 * c1)"
                " + ((3000000L * n_follow) div (4 * c1) * n_prec)"
                "   div bigram_types"
            ),
        )
    )
    from albedo_spark.operators.topk import global_top_k

    return global_top_k(
        scored.select(
            "w1", "w2", "c12", "c1", "n_follow", "n_prec",
            "bigram_types", "p_kn_ppm",
        ),
        [F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc()],
        k,
    )


def textrank_keywords(
    docs: DataFrame,
    k: int = 30,
    iterations: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau 2004 —
    public algorithm): PageRank over the word co-occurrence graph, here
    the UNWEIGHTED symmetric graph of distinct adjacent-token pairs
    (window = 2, the paper's default), reusing ``operators/graph.py
    pagerank``'s exact-BIGINT power iteration — rank sums are
    order-independent floor divisions, so the DuckDB oracle's unrolled
    CTEs derive identical integers (the q121 discipline). Output: the
    ``k`` highest-centrality words ``(word, rank)``.

    Plan at 100 TB: one bigram explode over the corpus collapses to the
    DISTINCT co-occurrence EDGE set (|edges| ≪ corpus — bounded by
    vocab², in practice near-linear in vocab); the undirected edge is
    canonicalized (least, greatest) BEFORE the distinct so symmetric
    duplicates collapse in the same shuffle, then mirrored. PageRank
    persists the degree-attached edge frame once; per-round cost is one
    join + one partial-agg sum with localCheckpoint lineage truncation.
    Hub words (stopwords) are the AQE skew-join case — production
    callers typically drop stopwords first, which only shrinks the
    graph.
    """
    from albedo_spark.io import widen as _widen

    base = _widen(docs.select(F.col(text_col))).select(
        tokens(F.col(text_col)).alias("_t")
    )
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    und = (
        pairs.where(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("u"), F.greatest("w1", "w2").alias("v")
        )
        .distinct()
    )
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    from albedo_spark.operators.graph import pagerank
    from albedo_spark.operators.topk import global_top_k

    ranks = pagerank(edges, iterations=iterations)
    return global_top_k(
        ranks.select(F.col("node").alias("word"), "rank"),
        [F.col("rank").desc(), F.col("word").asc()],
        k,
    )


#: BIGINT-headroom ceiling on the corpus token total in collocations:
#: the score numerator is (c_ab − δ)·N·10⁴ with c_ab ≤ N, so the worst
#: product is N²·10⁴ — inside int64 iff N ≤ 3·10⁷ tokens per scored
#: shard. Past it, shard the corpus (scores are count-ratio statistics;
#: per-shard top-k then merge, or lower the scale).
_COLLOC_N_CEIL = 30_000_000


def collocations(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    delta: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Phrase DISCOVERY — the learning half of the phrase machinery
    whose serving half is ``retrieval.phrase_match`` (q157): the top-k
    bigram collocations under the word2vec phrase criterion (Mikolov et
    al. 2013, arXiv:1310.4546 §4 — public method) ``score =
    (count(ab) − δ) / (count(a)·count(b))``, kept engine-exact as the
    scaled BIGINT ``score_x10k = (c_ab − δ)·N·10⁴ div (c_a·c_b)`` (the
    ·N factor normalizes the rational to corpus-size-free units; δ
    discounts rare-pair flukes). ``min_count`` must exceed ``delta`` so
    the numerator stays positive — Spark's ``div`` truncates toward
    zero while DuckDB's ``//`` floors, and a negative numerator would
    be the one place they disagree (guarded at entry).

    Returns ``(w1, w2, pair_n, w1_n, w2_n, score_x10k)``, ordered
    (score desc, w1, w2), LIMIT k.

    Plan: ONE corpus tokenize materialized once (localCheckpoint);
    unigram and adjacent-bigram aggregates both partial-aggregate
    map-side off it; the corpus total rides a broadcast cross join (the
    lazy-scalar idiom) with the headroom tripwire inline; one
    TakeOrderedAndProject tail. Nothing after the token aggregates
    scales with the corpus."""
    from albedo_spark.io import widen as _widen
    from albedo_spark.operators.bpe import _adjacent

    if min_count <= delta:
        raise ValueError(
            f"collocations: min_count ({min_count}) must exceed delta "
            f"({delta}) — a non-positive score numerator floor-divides "
            "differently across engines"
        )
    arrs = (
        _widen(docs.where(F.col(text_col).isNotNull()).select(F.col(text_col)))
        .select(tokens(F.col(text_col)).alias("_w"))
        .where(F.size("_w") > 0)
        .localCheckpoint(eager=False)  # consumers: unigrams + bigrams
    )
    uni = (
        arrs.select(F.explode("_w").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # consumers: two joins + N
    )
    total = uni.agg(F.sum("n").alias("_N")).select(
        F.when(
            F.col("_N") > F.lit(_COLLOC_N_CEIL),
            F.raise_error(
                F.concat(
                    F.lit("collocations: corpus total "),
                    F.col("_N").cast("string"),
                    F.lit(
                        f" tokens exceeds the score headroom"
                        f" {_COLLOC_N_CEIL}; shard the corpus"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.col("_N"))
        .alias("_N")
    )
    pairs = (
        arrs.select(F.explode(_adjacent("_w")).alias("p"))
        .where((F.col("p")["l"] != "") & (F.col("p")["r"] != ""))
        .groupBy(F.col("p")["l"].alias("w1"), F.col("p")["r"].alias("w2"))
        .agg(F.count("*").alias("pair_n"))
        .where(F.col("pair_n") >= min_count)
    )
    scored = (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("w1_n")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("w2_n")), "w2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score_x10k",
            F.expr(f"(pair_n - {delta}) * _N * 10000 div (w1_n * w2_n)"),
        )
    )
    return (
        scored.select("w1", "w2", "pair_n", "w1_n", "w2_n", "score_x10k")
        .orderBy(F.col("score_x10k").desc(), "w1", "w2")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Character-n-gram language identification (VERDICT r13 #3)
# ---------------------------------------------------------------------------

#: Seed texts the frozen language profiles are trained on — a few
#: hand-written sample sentences per language (authored for this repo;
#: plain everyday prose, no external corpus). Deliberately small and
#: FROZEN: the ranked trigram profiles derived from them are part of the
#: operator's deterministic contract, exactly like LANG_STOPWORDS above —
#: the oracle replays classification against the identical profile rows.
#: Swap in profiles trained on real per-language corpora for production
#: accuracy; the plan shape is unchanged (profiles stay a broadcast).
LANGID_SEED_TEXTS: dict[str, str] = {
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "kinder gehen am morgen zur schule während die sonne über der "
        "stadt aufgeht die frau liest eine zeitung im garten und der mann "
        "trinkt seinen kaffee in der küche wir haben gestern einen langen "
        "brief an unsere freunde geschrieben und sie werden uns im sommer "
        "besuchen das wetter ist heute schön aber morgen soll es regnen "
        "die katze schläft auf dem warmen fensterbrett und der hund "
        "wartet vor der tür auf sein essen"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and the children "
        "walk to school in the morning while the sun rises over the town "
        "the woman reads a newspaper in the garden and the man drinks "
        "his coffee in the kitchen we wrote a long letter to our friends "
        "yesterday and they will visit us in the summer the weather is "
        "nice today but it should rain tomorrow the cat sleeps on the "
        "warm window sill and the dog waits at the door for its dinner"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y los "
        "niños caminan a la escuela por la mañana mientras el sol sale "
        "sobre la ciudad la mujer lee un periódico en el jardín y el "
        "hombre toma su café en la cocina ayer escribimos una carta "
        "larga a nuestros amigos y ellos nos visitarán en el verano el "
        "tiempo está bonito hoy pero mañana debería llover el gato "
        "duerme en la ventana caliente y el perro espera su comida en "
        "la puerta"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et "
        "les enfants marchent vers l'école le matin pendant que le "
        "soleil se lève sur la ville la femme lit un journal dans le "
        "jardin et l'homme boit son café dans la cuisine nous avons "
        "écrit une longue lettre à nos amis hier et ils nous rendront "
        "visite en été le temps est beau aujourd'hui mais il devrait "
        "pleuvoir demain le chat dort sur le rebord chaud de la fenêtre "
        "et le chien attend son repas devant la porte"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒狗 孩子们早上走路去学校 太阳在城市上空升起 "
        "那位女士在花园里看报纸 男人在厨房里喝咖啡 我们昨天给朋友们写了一封长信 "
        "他们夏天会来看我们 今天天气很好 但是明天可能会下雨 "
        "猫睡在温暖的窗台上 狗在门口等着它的晚饭"
    ),
}


def sentence_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Sentence segmentation + Flesch Reading Ease (Flesch 1948, public
    formula) as integer-exact per-document statistics — the classic
    readability signal quality pipelines bucket on (too-easy ≈ spam and
    listicles, unreadable ≈ OCR noise and minified junk), and the
    sentence-level stats every packing/chunking stage wants anyway.

    Deterministic contract (all frozen, both engines replay verbatim):

    - sentences: non-empty ``[.!?]+``-delimited segments containing at
      least one letter (the rough segmentation the published formula
      was fit on; no abbreviation dictionary — a frozen rule beats a
      fuzzy better one for cross-engine replay),
    - words: letters-only tokens (the langid normalization),
    - syllables(word): ``max(1, vowel-groups - (1 if the word ends in
      'e' and has >1 vowel group else 0))``, vowel class [aeiouy] —
      the standard counting heuristic,
    - ``flesch_x100 = floor((206.835 - 1.015·(W/S) - 84.6·(Y/W))·100
      + 0.5)`` — the catalog's scaled-integer convention; the inner
      arithmetic is the same IEEE double sequence in any engine.
      NULL when a document has no sentence or no word.

    Returns ``(doc_id, n_sentences, n_words, n_syllables,
    words_per_sent_x100, syll_per_word_x100, flesch_x100)``.

    Plan at 100 TB: one map-only projection — segmentation, token and
    syllable counts are in-row HOFs; no shuffle, no UDF."""
    text = F.col(text_col)
    sents = F.filter(
        F.split(text, r"[.!?]+"),
        lambda s: s.rlike(r"\p{L}"),
    )
    words = _letter_words_ts(text)
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))
                - F.when(
                    w.rlike("e$")
                    & (
                        F.size(
                            F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)
                        )
                        > 1
                    ),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = docs.where(text.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.size(sents).cast("long").alias("n_sentences"),
        F.size(words).cast("long").alias("n_words"),
        syl.alias("n_syllables"),
    )
    s, w, y = (
        F.col("n_sentences"),
        F.col("n_words"),
        F.col("n_syllables"),
    )
    ok = (s > 0) & (w > 0)
    wps = w.cast("double") / s.cast("double")
    ypw = y.cast("double") / w.cast("double")
    return base.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.when(ok, F.floor(wps * 100.0 + 0.5).cast("long")).alias(
            "words_per_sent_x100"
        ),
        F.when(ok, F.floor(ypw * 100.0 + 0.5).cast("long")).alias(
            "syll_per_word_x100"
        ),
        F.when(
            ok,
            F.floor(
                (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw)
                * 100.0
                + 0.5
            ).cast("long"),
        ).alias("flesch_x100"),
    )


def _letter_words_ts(text: Column) -> Column:
    """Letters-only lowercase word array (the langid normalization;
    empty/letterless → empty array). Twin of extraction._letter_words —
    kept local so textstats has no import cycle with extraction."""
    w = F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}]+", " "))
    return F.when(w == "", F.array().cast("array<string>")).otherwise(
        F.split(w, " ")
    )


# Distinctive programming keywords (NOT if/else/for/while — those are
# ordinary prose). Frozen: the list is part of the deterministic
# contract, exactly like LANG_STOPWORDS.
CODE_KEYWORDS: tuple[str, ...] = (
    "def", "class", "import", "return", "function", "var", "const",
    "void", "public", "static", "struct", "typedef", "lambda", "elif",
    "printf", "include", "int", "self", "null", "bool",
)

_CODE_SYMBOLS = r"[{}();=<>\[\]]"
_SNAKE_OR_CAMEL = r"^([a-z]+(_[a-z0-9]+)+|[a-z]+([A-Z][a-z0-9]+)+)$"


def code_signals(col: Column) -> list[Column]:
    """The five integer code-likeness signals, each in permille —
    the code-vs-prose domain router's raw features (The Stack /
    RedPajama-class pipelines route code separately: different
    dedup granularity, different mixture weight, different quality
    rules). All Java-regex ∩ RE2, exactly replayable:

    - ``symbol_pm``: structural symbol chars ({};()=<>[]) over
      non-space chars,
    - ``kw_pm``: distinctive keyword tokens over word tokens
      (identifier-preserving split — underscores stay),
    - ``line_pm``: lines ending in ``;`` / ``{`` / ``}``,
    - ``indent_pm``: lines starting with 2+ spaces or a tab,
    - ``ident_pm``: snake_case / camelCase identifier tokens.
    """
    nonspace = F.regexp_replace(col, r"\s+", "")
    n_chars = F.length(nonspace)
    n_symbols = n_chars - F.length(
        F.regexp_replace(nonspace, _CODE_SYMBOLS, "")
    )
    symbol_pm = F.when(
        n_chars > 0, (F.lit(1000) * n_symbols / n_chars).cast("long")
    ).otherwise(F.lit(0).cast("long"))

    wtxt = F.trim(F.regexp_replace(col, r"[^A-Za-z_]+", " "))
    words = F.when(
        wtxt == "", F.array().cast("array<string>")
    ).otherwise(F.split(wtxt, " "))
    kw = F.array(*[F.lit(k) for k in CODE_KEYWORDS])
    n_words = F.size(words)
    n_kw = F.size(F.filter(words, lambda t: F.array_contains(kw, F.lower(t))))
    kw_pm = F.when(
        n_words > 0, (F.lit(1000) * n_kw / n_words).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    n_ident = F.size(F.filter(words, lambda t: t.rlike(_SNAKE_OR_CAMEL)))
    ident_pm = F.when(
        n_words > 0, (F.lit(1000) * n_ident / n_words).cast("long")
    ).otherwise(F.lit(0).cast("long"))

    lines = F.split(col, "\n")
    n_lines = F.size(lines)
    n_punct = F.size(F.filter(lines, lambda l: l.rlike(r"[;{}]\s*$")))
    line_pm = F.when(
        n_lines > 0, (F.lit(1000) * n_punct / n_lines).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    n_indent = F.size(F.filter(lines, lambda l: l.rlike(r"^(\t|  )")))
    indent_pm = F.when(
        n_lines > 0, (F.lit(1000) * n_indent / n_lines).cast("long")
    ).otherwise(F.lit(0).cast("long"))

    return [
        symbol_pm.alias("symbol_pm"),
        kw_pm.alias("kw_pm"),
        line_pm.alias("line_pm"),
        indent_pm.alias("indent_pm"),
        ident_pm.alias("ident_pm"),
    ]


#: The router's frozen contract, defined ONCE: signal weights in
#: ``code_signals`` order (symbol, kw, line, indent, ident) and the
#: is_code routing threshold on the raw (un-capped) weighted sum.
CODE_LIKENESS_WEIGHTS = (3, 4, 2, 1, 2)
CODE_ROUTE_THRESHOLD = 1500


def code_likeness_raw(
    symbol_pm: Column,
    kw_pm: Column,
    line_pm: Column,
    indent_pm: Column,
    ident_pm: Column,
) -> Column:
    """The frozen weighted fold over ALREADY-COMPUTED signal columns —
    the single definition of the router's weights, shared by
    ``code_likeness_x10k`` (signals derived in place) and callers that
    materialize the signals once and fold from the columns (q183's
    single-evaluation shape). Returns the RAW sum (un-capped), so the
    threshold comparison and the ×10⁴ cap both derive from it."""
    w = CODE_LIKENESS_WEIGHTS
    return (
        F.lit(w[0]) * symbol_pm + F.lit(w[1]) * kw_pm
        + F.lit(w[2]) * line_pm + F.lit(w[3]) * indent_pm
        + F.lit(w[4]) * ident_pm
    )


def code_likeness_x10k(col: Column) -> Column:
    """Code-likeness score ×10⁴, the frozen weighted fold of
    ``code_signals`` (weights are contract, like quality_score's):

        min(10000, 3·symbol + 4·kw + 2·line + 1·indent + 2·ident)

    Prose scores near 0 (all five signals are structurally rare in
    natural language); real code lands in the thousands via symbols,
    terminator lines and identifiers even when no keyword matches.
    Integer throughout — both engines fold the identical permilles."""
    raw = code_likeness_raw(*code_signals(col))
    return F.least(F.lit(10000).cast("long"), raw.cast("long"))


def _langid_norm_py(text: str) -> str:
    """Python mirror of the classifier's in-plan normalization (used only
    to TRAIN the frozen profiles, driver-side, on the tiny seed texts):
    lowercase, every non-letter run → one space, trim. ``str.isalpha``
    tracks the Unicode Alphabetic property — the same class the engines'
    ``[^\\p{L}]+`` regex removes (the seed texts only use characters on
    which the three implementations agree)."""
    out = "".join(ch if ch.isalpha() else " " for ch in text.lower())
    return " ".join(out.split())


def train_char_ngram_profiles(
    seeds: dict[str, str] | None = None, n_max: int = 3, top_k: int = 64
) -> list[tuple[str, str, int]]:
    """Train the frozen ranked n-gram profiles — the Cavnar & Trenkle
    (1994, "N-Gram-Based Text Categorization" — public method) language
    models: per language, the ``top_k`` most frequent padded character
    n-grams of ALL sizes 1..``n_max`` of the seed text (mixed sizes are
    the paper's own design — character UNIGRAMS carry the signal for
    CJK scripts, where trigram diversity is too high for small profiles
    to overlap), ranked 1..top_k by (count desc, gram asc). Pure
    deterministic Python over the tiny seeds (driver-side by design:
    the profiles are literals the plan broadcasts, not data). Returns
    ``[(lang, gram, rank)]`` sorted by (lang, rank)."""
    import collections

    seeds = seeds if seeds is not None else LANGID_SEED_TEXTS
    out: list[tuple[str, str, int]] = []
    for lang in sorted(seeds):
        t = " " + _langid_norm_py(seeds[lang]) + " "
        counts = collections.Counter(
            g
            for n in range(1, n_max + 1)
            for i in range(len(t) - n + 1)
            if (g := t[i : i + n]).strip() != ""  # pure-padding grams
            # carry no language signal and would match every profile
        )
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out.extend((lang, g, r + 1) for r, (g, _) in enumerate(ranked))
    return out


def _char_grams_123(t: Column) -> Column:
    """All padded character n-grams (sizes 1..3) of one lambda-BOUND
    normalized string, as a single flat array. One split-to-chars plus
    ``zip_with`` over shifted slices — every per-element op is O(1),
    where the obvious ``substr(t, i, n)`` per position is O(i) on UTF8
    strings (byte-offset seek), turning gram generation O(L²) per doc
    (measured ~30% of the langid operator before the rewrite). Null
    padding from the shorter zip side marks the overhang; nulls and
    pure-padding grams (language-free — they would match every profile)
    are filtered out. Shared by the classifier (``langid_chargram``) and
    the corpus trainer (``train_langid_profiles_df``), so both sides of
    the train/apply contract generate the IDENTICAL gram set."""

    def _with_chars(c: Column) -> Column:
        n = F.size(c)
        bi = F.zip_with(
            c,
            F.slice(c, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, b),
        )

        def _with_bi(bv: Column) -> Column:
            tri = F.zip_with(
                bv,
                F.slice(c, 3, F.greatest(n - 2, F.lit(0))),
                lambda ab, d: F.concat(ab, d),
            )
            return F.flatten(F.array(c, bv, tri))

        return _bind(bi, _with_bi)

    return F.filter(
        _bind(F.split(t, ""), _with_chars),
        lambda g: g.isNotNull() & (F.trim(g) != ""),
    )


def _langid_norm_col(text: Column) -> Column:
    """The classifier/trainer shared in-plan normalization: lowercase,
    every non-letter run → one space, trim, pad with one boundary space
    each side (the padded-gram design — boundary grams carry word-edge
    signal). The Python mirror is ``_langid_norm_py``."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}]+", " ")),
        F.lit(" "),
    )


def train_langid_profiles_df(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 64,
    head_chars: int | None = None,
) -> DataFrame:
    """Train Cavnar & Trenkle (1994) ranked n-gram language profiles
    FROM A LABELED CORPUS — the distributed half of the train/apply
    contract (``train_char_ngram_profiles`` trains the same shape from
    tiny driver-side seed texts; this trains from data, the way every
    other trainable family here pairs its halves — BPE q75/q126,
    WordPiece q170/q168, unigram-LM q159/q155). Per language: the
    ``top_k`` most frequent padded character n-grams of all sizes 1..3
    across every document labeled with that language, ranked 1..top_k
    by (count desc, gram asc) — the identical normalization, gram set
    and tiebreak the classifier applies, so a trained profile plugs
    straight into ``langid_chargram(profiles=...)`` (collect the ≤
    |langs|·top_k result rows into the literal list — profiles are plan
    literals by design).

    Returns ``(lang, g, r, cnt)``: rank and the supporting corpus count.

    Plan at 100 TB: labels are upstream/human-supplied, so the trainer
    runs on a BOUNDED labeled sample, never the raw corpus (pass
    ``head_chars`` to also cap per-doc cost, the classifier's own
    posture). Gram explosion is map-side only — the one shuffle is the
    (lang, gram) count with partial aggregation combining before
    exchange — and the rank window partitions by language over the
    already-aggregated distinct-gram frame."""
    from pyspark.sql import Window

    from albedo_spark.io import widen

    text = F.col(text_col)
    if head_chars is not None:
        text = F.substring(text, 1, head_chars)
    # Gram generation is the heavy map stage here exactly as in the
    # classifier — balance an unsplittable scan before it (no-op on
    # wide inputs; see langid_chargram).
    src = widen(
        docs.where(
            F.col(text_col).isNotNull() & F.col(lang_col).isNotNull()
        ).select(lang_col, text_col)
    )
    base = src.select(
        F.col(lang_col).alias("lang"),
        F.explode(_char_grams_123(_langid_norm_col(text))).alias("g"),
    )
    counts = base.groupBy("lang", "g").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("g"))
    return (
        counts.withColumn("r", F.row_number().over(w).cast("int"))
        .where(F.col("r") <= top_k)
        .select("lang", "g", "r", "cnt")
    )


def langid_chargram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 3,
    top_k: int = 64,
    head_chars: int = 300,
    profiles: list[tuple[str, str, int]] | None = None,
    with_margin: bool = False,
) -> DataFrame:
    """Language identification by ranked character-n-gram profiles —
    Cavnar & Trenkle's out-of-place distance (1994, public method), the
    crawl pipeline's front-door langid stage (every per-language stage —
    q111's temperature mixture, q131's per-language quality cutoff —
    needs a ``lang`` column a real crawl does not have; VERDICT r13 #3).
    Returns ``(doc_id, lang_pred, dist_oop)`` for every non-NULL-text
    document: the language whose frozen profile minimizes

        dist = Σ over the document's top-``top_k`` padded character
               n-grams (all sizes 1..``n_max`` — the paper's mixed-size
               design; unigrams carry CJK) of |doc_rank - profile_rank|,
               or ``top_k`` when the gram is not in the profile (the
               out-of-place penalty),

    ties broken to the lexicographically smallest language code; docs
    with no letters at all classify as ``'und'`` (NULL distance).
    ``with_margin=True`` adds ``(runner_up, margin)`` — the second-best
    language and its distance gap, the ambiguity signal pipelines
    threshold on before trusting a prediction (margin 0 = a pure tie).
    Everything is integer-exact and rank-deterministic (doc grams rank
    by count desc, gram asc — the profile trainer's own tiebreak), so
    the DuckDB oracle replays classification bit-for-bit.

    Plan at 100 TB: per-doc cost is CAPPED at ``head_chars`` characters
    (Cavnar & Trenkle's own 300-byte truncation posture — language is
    decided in the first few hundred bytes), and the doc's ENTIRE ranked
    profile is
    computed WITHIN its row: all of a document's grams live in one
    array, so counting (sort + run-length over boundaries) and the
    top-``top_k`` rank (one struct array_sort on (-cnt, gram) — the
    identical tiebreak) are pure map-side HOFs over lambda-bound
    variables, and only ≤ top_k (doc, gram, rank) rows ever explode —
    the raw grams are never shuffled at all. The ≤ |langs|·top_k
    profile rides a BROADCAST into that tiny frame; the only shuffles
    are the (doc, lang) matched-gram aggregate and a doc-keyed
    struct-min argmin (see the dominance note inline — no cross-join,
    no window). The corpus is touched exactly once, truncated."""

    from albedo_spark.io import widen

    spark = docs.sparkSession
    prof = spark.createDataFrame(
        profiles if profiles is not None else
        train_char_ngram_profiles(n_max=n_max, top_k=top_k),
        "lang string, g string, r int",
    )
    # The per-doc ranked profile (gram chain + two in-row sorts) is the
    # operator's dominant cost and fuses into the SCAN stage — an
    # unsplittable single-file input would serialize it onto one core
    # (guide-§2.5 input skew). widen() balances exactly that case and
    # is a no-op on any scan that already fills the cores; projecting
    # to (id, text) first keeps the balancing exchange minimal.
    docs = widen(
        docs.where(F.col(text_col).isNotNull()).select(id_col, text_col)
    )
    norm = _langid_norm_col(F.substring(F.col(text_col), 1, head_chars))

    if n_max != 3:
        raise ValueError(
            "langid_chargram builds grams via the O(L) char-zip chain "
            "(_char_grams_123), written for the contract's n_max=3 "
            "(unigrams through trigrams — the frozen-profile design)"
        )

    def _top_of_sorted(s: Column) -> Column:
        # s is the lambda-bound SORTED gram array of one document. Its
        # per-gram counts are run lengths: boundary indices i where
        # s[i] != s[i-1], each count = next_boundary - boundary. Rank =
        # position after one struct sort on (-cnt, gram) — field order
        # makes array_sort apply exactly the (count desc, gram asc)
        # tiebreak the trainer and the oracle use. All in-row; nothing
        # here touches a shuffle. The boundary array is itself
        # lambda-bound (it is read three times below).
        def _entries_of(bs: Column) -> Column:
            nxt = F.concat(F.slice(bs, 2, F.size(bs)), F.array(F.size(s)))
            return F.zip_with(
                bs,
                nxt,
                lambda a, b: F.struct(
                    (a - b).alias("negcnt"),  # -(count): asc = cnt desc
                    F.element_at(s, a + 1).alias("g"),
                ),
            )

        entries = _bind(
            F.filter(
                F.sequence(F.lit(0), F.size(s) - 1),
                lambda i: (i == 0)
                | (F.element_at(s, i + 1) != F.element_at(s, i)),
            ),
            _entries_of,
        )
        return F.when(F.size(s) == 0, F.array().cast(
            "array<struct<negcnt:int,g:string>>"
        )).otherwise(F.slice(F.array_sort(entries), 1, top_k))

    ranked = _bind(
        norm,
        lambda t: _bind(F.array_sort(_char_grams_123(t)), _top_of_sorted),
    )
    # posexplode_OUTER: a letterless document (empty gram array) must
    # survive as one (doc_id, g=NULL, dr=NULL) row so its 'und'
    # fallback resolves inside the SAME doc-keyed aggregate as every
    # other doc — the alternative (re-attaching absent docs with a
    # doc-keyed join, as this operator originally did) needs either a
    # per-DOCUMENT broadcast (driver OOM at crawl scale) or an extra
    # shuffle of the whole id frame. ng is NULL exactly for these
    # rows (dr never is otherwise), which is the 'und' signal below.
    docprof = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode_outer(ranked).alias("_p", "_e"),
        )
        .select(
            "doc_id",
            F.col("_e.g").alias("g"),
            (F.col("_p") + 1).cast("int").alias("dr"),
        )
    )
    # Distance WITHOUT the |langs|x row amplification a literal
    # cross-join would cost: dist(lang) = top_k*ng - gain(lang), where
    # ng = the doc's profile size and gain(lang) = Σ over MATCHED grams
    # of (top_k - |dr - r|) ≥ 1 per match — so any language matching at
    # least one gram STRICTLY beats every unmatched language (whose
    # dist is exactly top_k*ng), and the argmin only ever needs the
    # matched (doc, lang) pairs plus one lexicographic fallback for
    # docs matching no profile at all. One broadcast left-join on the
    # gram (the ≤ |langs|·top_k profile — the only broadcast in the
    # plan), two tiny doc-keyed aggregates (argmin = min of a
    # (neg_gain, lang) struct — the same tiebreak as the row_number
    # idiom), no window, no cross-join, and NO doc-keyed join at all.
    all_langs = sorted(
        r["lang"] for r in prof.select("lang").distinct().collect()
    )
    fallback_lang = all_langs[0]
    matched = docprof.join(F.broadcast(prof), "g", "left")
    stats = matched.groupBy("doc_id", "lang").agg(
        F.sum(F.abs(F.col("dr") - F.col("r")).cast("long")).alias("msum"),
        F.count("*").alias("mn"),
        F.max("dr").alias("maxdr"),
    )
    mstruct = F.when(
        F.col("lang").isNotNull(),
        F.struct(
            (F.col("msum") - top_k * F.col("mn"))
            .cast("long")
            .alias("neggain"),
            F.col("lang").alias("lang"),
        ),
    )
    if not with_margin:
        per_doc = stats.groupBy("doc_id").agg(
            # dr is dense 1..ng, and every gram lands in at least one
            # group (the NULL-lang group when unmatched), so
            # max(maxdr) == ng — and ng is NULL exactly for letterless
            # docs (their single outer-explode row has dr NULL)
            F.max("maxdr").cast("long").alias("ng"),
            F.min(mstruct).alias("m"),
        )
        return per_doc.select(
            "doc_id",
            F.when(F.col("ng").isNull(), F.lit("und"))
            .otherwise(F.coalesce(F.col("m.lang"), F.lit(fallback_lang)))
            .alias("lang_pred"),
            (
                top_k * F.col("ng")
                + F.coalesce(F.col("m.neggain"), F.lit(0).cast("long"))
            ).alias("dist_oop"),
        )
    # Margin form (the FineWeb-style ambiguity knob): also report the
    # runner-up language and margin = runner_dist - best_dist. The
    # sorted matched-struct list replaces the single struct-min (≤
    # |langs| structs per doc — the collect is bounded by the profile
    # table, not the data); the dominance argument fills in the ranks
    # the matched list doesn't cover: with exactly one matched language
    # the runner-up is the LEXICOGRAPHICALLY smallest unmatched one at
    # distance top_k·ng, and with none matched every language ties
    # there, so best/runner are the first two language codes and the
    # margin is 0 — exactly what a full (dist, lang) ranking over all
    # |langs| rows would produce (the oracle replays it that way).
    lang_arr = F.array(*[F.lit(x) for x in all_langs])
    per_doc = stats.groupBy("doc_id").agg(
        F.max("maxdr").cast("long").alias("ng"),
        F.sort_array(F.collect_list(mstruct)).alias("ms"),
    )
    base_dist = top_k * F.col("ng")
    # try_element_at: out-of-bounds is a NULL, not an ANSI error — the
    # 0- and 1-matched docs read past the list by design
    m1 = F.try_element_at("ms", F.lit(1))
    m2 = F.try_element_at("ms", F.lit(2))
    best_lang = F.coalesce(m1["lang"], F.lit(fallback_lang))
    best_dist = base_dist + F.coalesce(m1["neggain"], F.lit(0).cast("long"))
    runner_lang = F.when(F.size("ms") >= 2, m2["lang"]).otherwise(
        F.element_at(F.filter(lang_arr, lambda x: x != best_lang), 1)
    )
    runner_dist = F.when(
        F.size("ms") >= 2, base_dist + m2["neggain"]
    ).otherwise(base_dist)
    return per_doc.select(
        "doc_id",
        F.when(F.col("ng").isNull(), F.lit("und"))
        .otherwise(best_lang)
        .alias("lang_pred"),
        best_dist.alias("dist_oop"),
        F.when(F.col("ng").isNotNull(), runner_lang).alias("runner_up"),
        (runner_dist - best_dist).cast("long").alias("margin"),
    )
