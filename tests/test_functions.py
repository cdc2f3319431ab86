"""Golden-vector tests for the native UDF replacements (FIXTURES.md
'clean_udf vectors'; reference semantics from S/closures/UDFs.scala)."""

import pytest
from pyspark.sql import functions as F

from albedo_spark.functions import (
    clean_company,
    clean_email,
    clean_location,
    contains_any,
    flag_any_like,
    lang_count_in_recent,
    lang_index_in_recent,
    null_flag,
)


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr(F.col("v")).alias("out")).collect()[0].out


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("@Google", "google"),
        ("google inc", "google"),
        ("Google.com", "google"),
        ("Ex-Facebook", "facebook"),
        ("formerly Amazon", "amazon"),
        ("ACME Co Ltd", "acme"),
        ("", "__empty"),
        ("!!!", "__empty"),
        ("小米", "小米"),  # CJK preserved (deliberate fix of reference quirk)
    ],
)
def test_clean_company(spark, raw, expected):
    assert _one(spark, raw, clean_company) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Vinta@gmail.com", "gmail.com"),
        ("x@sub.example.co", "sub.example.co"),
        ("not-an-email", "not-an-email"),
        ("", "__empty"),
    ],
)
def test_clean_email(spark, raw, expected):
    assert _one(spark, raw, clean_email) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        # space inside city → the reference's full-string match fails and the
        # whole string is kept (then cleaned) — NOT city extraction
        ("San Francisco, CA", "san francisco ca"),
        ("Taipei, Taiwan", "taipei"),
        ("New York City", "new york"),
        ("東京, 日本", "東京"),
        ("", "__empty"),
    ],
)
def test_clean_location(spark, raw, expected):
    assert _one(spark, raw, clean_location) == expected


def test_flag_any_like_and_contains(spark):
    df = spark.createDataFrame(
        [("a machine learning phd",), ("plain bio",), (None,)], "v string"
    )
    out = df.select(
        flag_any_like(F.col("v"), ["%machine learning%", "%deep learning%"]).alias("f"),
        contains_any(F.col("v"), ["phd", "professor"]).alias("c"),
    ).collect()
    assert [r.f for r in out] == [1.0, 0.0, 0.0]
    assert [r.c for r in out] == [1.0, 0.0, 0.0]


def test_null_flag(spark):
    df = spark.createDataFrame([("a", "b"), (None, "b")], "x string, y string")
    out = df.select(null_flag([F.col("x"), F.col("y")]).alias("f")).collect()
    assert [r.f for r in out] == [0.0, 1.0]


def test_lang_index_and_count(spark):
    df = spark.createDataFrame(
        [("Python", ["python", "go", "python"]),
         ("Rust", ["python", "go", "python"])],
        "repo_language string, user_recent_repo_languages array<string>",
    )
    out = df.select(
        lang_index_in_recent(
            F.col("repo_language"), F.col("user_recent_repo_languages")
        ).alias("idx"),
        lang_count_in_recent(
            F.col("repo_language"), F.col("user_recent_repo_languages")
        ).alias("cnt"),
    ).collect()
    # reference indexOf is 0-based; miss → size + 50 (UDFs.scala:80-87)
    assert (out[0].idx, out[0].cnt) == (0, 2)
    assert (out[1].idx, out[1].cnt) == (3 + 50, 0)


def test_repetition_signals(spark):
    from albedo_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a a a a"),               # all dup words; bigrams 'a a' x3 dup
            (2, "w x y z"),               # no repetition at any n
            (3, "go stop go stop go"),    # bigram loop
            (4, ""),                      # empty -> all zero
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dup_word_x10k, r.dup_bigram_x10k, r.dup_trigram_x10k)
        for r in df.select("doc_id", *repetition_signals(F.col("text"))).collect()
    }
    assert got[1] == (7500, 6667, 5000)   # 1-1/4, 1-1/3, 1-1/2
    assert got[2] == (0, 0, 0)
    # words: 5 tokens 2 distinct -> 0.6; bigrams: 4 total 2 distinct -> 0.5;
    # trigrams: 3 total 2 distinct -> 1/3
    assert got[3] == (6000, 5000, 3333)
    assert got[4] == (0, 0, 0)


def test_pii_redaction(spark):
    from albedo_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp-mail.co.uk now"),
            (2, "from 192.168.1.17 and 10.0.0.1 end"),
            (3, "call +1-555-0099 or +44-123-4567"),
            (4, "clean text, no pii here 1234"),
            (5, "mix a@b.io at 8.8.8.8 tel +1-555-1234"),
        ],
        "id long, text string",
    )
    out = df.select(
        "id", redact_pii(F.col("text")).alias("red"), *pii_counts(F.col("text"))
    )
    got = {r.id: (r.red, r.n_email, r.n_ipv4, r.n_phone) for r in out.collect()}
    assert got[1] == ("mail <EMAIL> now", 1, 0, 0)
    assert got[2] == ("from <IP> and <IP> end", 0, 2, 0)
    assert got[3] == ("call <PHONE> or <PHONE>", 0, 0, 2)
    assert got[4] == ("clean text, no pii here 1234", 0, 0, 0)
    assert got[5] == ("mix <EMAIL> at <IP> tel <PHONE>", 1, 1, 1)


def test_strip_markup(spark):
    """Tag/entity semantics: script+style+comment BODIES drop, tags strip
    to spaces, entities decode AFTER tags (escaped markup survives as
    text), '&amp;' decodes last (no double-decode), whitespace collapses,
    plain text passes through untouched."""
    from albedo_spark.functions.text import markup_ratio_x10k, strip_markup

    df = spark.createDataFrame(
        [
            (1, "<p>hello <b>world</b></p>"),
            (2, "<script>var x = '<p>gone</p>';</script>kept"),
            (3, "<style media='x'>p{color:red}</style>body"),
            (4, "a <!-- secret --> b"),
            (5, "use &lt;i&gt; and &quot;q&quot; it&#39;s &amp;lt;ok"),
            (6, "plain text stays"),
            (7, "<div\n class='x'>multi\n  line</div>"),
        ],
        "id long, text string",
    )
    out = df.select(
        "id",
        strip_markup(F.col("text")).alias("clean"),
        markup_ratio_x10k(F.col("text")).alias("ratio"),
    )
    got = {r.id: (r.clean, r.ratio) for r in out.collect()}
    assert got[1][0] == "hello world"
    assert got[2][0] == "kept"
    assert got[3][0] == "body"
    assert got[4][0] == "a b"
    assert got[5][0] == 'use <i> and "q" it\'s &lt;ok'
    assert got[6] == ("plain text stays", 0)
    assert got[7][0] == "multi line"
    assert got[1][1] == 5600  # 14 of 25 chars removed -> floor(5600.0+0.5)


def test_ngram_contamination(spark):
    from albedo_spark.operators.textstats import ngram_contamination

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox goes elsewhere entirely today"),
            (3, "completely different words with zero overlap here"),
            (4, "xy"),  # 1 token -> no trigrams
        ],
        "doc_id long, text string",
    )
    probes = docs.where("doc_id = 1")
    got = {
        r.doc_id: (r.n_hits, r.n_grams, r.contaminated_x10k)
        for r in ngram_contamination(docs, probes, n=3).collect()
    }
    assert got[1] == (7, 7, 10000)       # self-probe: full contamination
    assert got[2] == (1, 5, 2000)        # shares 'quick brown fox'
    assert got[3] == (0, 5, 0)  # 7 tokens -> 5 trigrams, none shared
    assert got[4] == (0, 0, 0)           # no grams -> defined zero


def test_contamination_plan_broadcasts_probes(spark):
    from albedo_spark.operators.textstats import ngram_contamination

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    probes = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    out = ngram_contamination(docs, probes, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Pins the VERDICT r5 #2 single-pass restructure: exactly ONE join in
    # the whole plan — the broadcast-mark join on gram (probe side
    # broadcast, LEFT so gram-less docs keep their zero row without a
    # second corpus pass) — and the hit aggregate runs PARTIAL below the
    # exchange, so non-matching grams are collapsed to one row per doc
    # map-side and the shuffle carries |docs| rows, never the gram stream.
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    import re

    gram_joins = re.findall(
        r"BroadcastHashJoin \[gram[^\]]*\], \[gram[^\]]*\], (\w+)", plan
    )
    assert gram_joins == ["LeftOuter"], plan
    assert "partial_sum" in plan, plan


def test_vocab_sketch_matches_exact_within_tolerance(spark):
    """The 100 TB path for q70's vocabulary count is approx_count_distinct
    (HLL, default rsd=5%); pin that the sketch lands within tolerance of
    the exact distinct on a real corpus so the swap is a config change,
    not a leap of faith."""
    from albedo_spark.io import load_table
    from albedo_spark.operators.textstats import tokens

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    grams = d.select(F.explode(tokens(F.col("text"))).alias("g"))
    exact = grams.agg(F.countDistinct("g")).collect()[0][0]
    approx = grams.agg(F.approx_count_distinct("g", rsd=0.05)).collect()[0][0]
    assert exact > 0
    assert abs(approx - exact) / exact < 0.15  # 3x the nominal 5% rsd


def test_hashed_tf_features(spark):
    import hashlib, math
    from albedo_spark.operators.textstats import hashed_tf_features

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.dim_idx): r.weight_x1m
           for r in hashed_tf_features(docs, dim=16).collect()}
    assert set(d for d, _ in got) == {1}   # empty/null dropped
    b = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16
    ba, bb = b("apple"), b("banana")
    norm = math.sqrt(2 * 2 + 1 * 1)
    assert got[(1, ba)] == math.floor(2 * 1e6 / norm + 0.5)
    assert got[(1, bb)] == math.floor(1 * 1e6 / norm + 0.5)
    # L2 normalization: sum of squared weights ~ 1e12
    total = sum(w * w for w in got.values())
    assert abs(total - 1e12) < 1e7


def test_sliding_active_hll_within_tolerance(spark):
    """q89's documented 100 TB swap: per sliding window,
    approx_count_distinct (HLL — sketches merge across partials, no
    (window, user) de-dup state) lands within tolerance of the exact
    distinct, so the swap is a one-line config of the same plan — the
    q70 vocabulary precedent applied to the active-user count."""
    from albedo_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    w = F.window("ts", "1 hour", "15 minutes").alias("w")
    exact = e.groupBy(w).agg(F.count_distinct("user_id").alias("n"))
    approx = e.groupBy(w).agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("a")
    )
    rows = exact.join(approx, "w").select("n", "a").collect()
    assert rows
    for r in rows:
        assert abs(r.a - r.n) <= max(3, 0.15 * r.n), (r.n, r.a)


def test_percentile_sketch_within_tolerance(spark):
    """The 100 TB swap for the exact-percentile queries (q42 price
    percentiles, q81 IQR fences, q87 profile): approx_percentile (the
    mergeable KLL-style sketch) must land within tolerance of the exact
    percentile on real data, so the swap is a config change — the
    q70/q89 HLL precedent applied to quantiles."""
    from albedo_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    for q in (0.25, 0.5, 0.75, 0.95):
        exact, approx = e.agg(
            F.expr(f"percentile(value, {q})"),
            F.expr(f"approx_percentile(value, {q}, 1000)"),
        ).collect()[0]
        spread = e.agg(
            F.expr("percentile(value, 0.99) - percentile(value, 0.01)")
        ).collect()[0][0]
        assert abs(approx - exact) <= max(0.05 * abs(spread), 1e-9), (q, exact, approx)


def test_blocklist_filter(spark):
    """Word-boundary + case-insensitivity + regex escaping: 'slower' does
    not hit 'slow', 'C++' as a term matches literally (escaped), and
    max_hits gates the filter."""
    from albedo_spark.operators.textstats import (
        blocklist_filter,
        blocklist_hits,
        blocklist_pattern,
    )

    df = spark.createDataFrame(
        [
            (1, "this is slow and SLOW again"),
            (2, "slower slowest unslow"),
            (3, "we use C++ here"),
            (4, "clean text"),
            (5, "one slow mention"),
            (6, None),
        ],
        "id long, text string",
    )
    terms = ["slow", "C++"]
    got = {
        r.id: r.n
        for r in df.select(
            "id", blocklist_hits(F.col("text"), terms).alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 0, 3: 1, 4: 0, 5: 1, 6: None}
    kept = sorted(
        r.id for r in blocklist_filter(df, terms, max_hits=0).collect()
    )
    assert kept == [2, 4, 6]  # NULL text carries no content -> passes
    kept1 = sorted(
        r.id for r in blocklist_filter(df, terms, max_hits=1).collect()
    )
    assert kept1 == [2, 3, 4, 5, 6]
    import pytest as _pt

    with _pt.raises(ValueError):
        blocklist_pattern([])


def test_oov_rate(spark):
    """Vocab = top-k by (freq DESC, word ASC); OOV counts per doc are
    exact; empty/NULL docs drop; frequency ties at the boundary break
    lexicographically."""
    from albedo_spark.operators.textstats import oov_rate

    df = spark.createDataFrame(
        [
            (1, "a a a b b c"),   # freqs: a3 b3(doc1+2) c2 d1
            (2, "b c d a"),
            (3, ""),              # empty -> dropped
            (4, None),            # NULL -> dropped
        ],
        "doc_id long, text string",
    )
    # corpus freqs: a=4, b=3, c=2, d=1 -> vocab_size=2 -> {a, b}
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_x10k)
        for r in oov_rate(df, vocab_size=2).collect()
    }
    assert got == {1: (6, 1, 1666), 2: (4, 2, 5000)}
    # tie at the boundary: with vocab_size=3, c (freq 2) is in, d is out
    got3 = {r.doc_id: r.n_oov for r in oov_rate(df, vocab_size=3).collect()}
    assert got3 == {1: 0, 2: 1}


def test_strip_controls_and_nfc_normalize(spark):
    import unicodedata

    from pyspark.sql import functions as F

    from albedo_spark.functions.text import nfc_normalize, strip_controls

    decomposed = "cafe\u0301 u\u0308ber"
    rows = [
        (1, "plain ascii"),
        (2, decomposed),
        (3, "nul\x00tab\x07del\x7fkeep"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r.i: r.norm
        for r in df.select(
            "i", nfc_normalize(strip_controls(F.col("t"))).alias("norm")
        ).collect()
    }
    assert out[1] == "plain ascii"
    assert out[2] == unicodedata.normalize("NFC", decomposed)
    assert len(out[2]) == len(decomposed) - 2  # two combining marks fused
    assert out[3] == "nultabdelkeep"
    assert out[4] is None


def test_canonicalize_url_policy(spark):
    """Every documented canonicalization step (functions/urls.py —
    VERDICT r13 #4): fragment, default ports, scheme/host case, tracking
    params (order of the rest preserved), trailing slashes, and the
    garbage pass-through."""
    from albedo_spark.functions.urls import canonicalize_url, url_host

    cases = {
        1: ("HTTP://WWW.Example.COM:80/Docs/A/?utm_source=x&id=5&fbclid=z#f",
            "http://www.example.com/Docs/A?id=5", "example.com"),
        2: ("https://example.com:443/a/b///", "https://example.com/a/b",
            "example.com"),
        3: ("https://Example.com/a?z=2&utm_campaign=c&a=1",
            "https://example.com/a?z=2&a=1", "example.com"),  # order kept
        4: ("http://example.com/", "http://example.com", "example.com"),
        5: ("no scheme here ", "no scheme here", ""),
        6: ("http://example.com:8080/P", "http://example.com:8080/P",
            "example.com"),  # non-default port kept; path case kept
        7: ("https://example.com/?utm_source=only", "https://example.com",
            "example.com"),
        8: ("ftp://Files.Example.com/Pub/", "ftp://files.example.com/Pub",
            "files.example.com"),
    }
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in cases.items()], "i long, u string"
    )
    got = {
        r.i: (r.c, r.h)
        for r in df.select(
            "i",
            canonicalize_url(F.col("u")).alias("c"),
            url_host(F.col("u")).alias("h"),
        ).collect()
    }
    for i, (_, want_c, want_h) in cases.items():
        assert got[i] == (want_c, want_h), (i, got[i])


def test_canonicalize_url_idempotent_and_digest_property(spark):
    """The two contract properties (VERDICT r13 #4): canonicalization is
    idempotent (a canonical URL is its own canonical form), and
    canonical-equal URLs produce equal digests — so URL-level dedup keys
    are stable however messy the crawl's raw strings are. Checked over a
    generated mess grid (case x port x slash x params x fragment), which
    by construction collapses to exactly its clean core set."""
    from albedo_spark.functions.urls import canonicalize_url

    base = spark.range(600).select(
        F.expr("""concat(
            CASE WHEN id % 2 = 0 THEN 'HTTPS://Example' ELSE 'https://example' END,
            cast(id % 3 AS string), '.com',
            CASE WHEN id % 5 = 0 THEN ':443' ELSE '' END,
            '/p/', cast(id % 4 AS string),
            CASE WHEN id % 7 = 0 THEN '/' ELSE '' END,
            CASE WHEN id % 2 = 0 THEN '?utm_medium=a&k=1' ELSE '?k=1' END,
            CASE WHEN id % 11 = 0 THEN '#x' ELSE '' END)""").alias("u")
    )
    out = base.select(
        "u",
        canonicalize_url(F.col("u")).alias("c1"),
    ).select("u", "c1", canonicalize_url(F.col("c1")).alias("c2"))
    assert out.where("c1 != c2").count() == 0  # idempotence
    # the grid collapses to its clean core: host(3) x page(4) = 12 forms
    canon = {r.c1 for r in out.collect()}
    assert len(canon) == 12
    assert canon == {
        f"https://example{h}.com/p/{p}?k=1" for h in range(3) for p in range(4)
    }
    # canonical-equal => digest-equal (md5 of the canonical string is a
    # function of it; pin that the dedup key space is the canonical set)
    digests = base.select(
        F.md5(canonicalize_url(F.col("u"))).alias("d")
    ).distinct().count()
    assert digests == 12


def test_url_dedup_and_host_profile(spark):
    """url_dedup keeps min-id per canonical URL and passes NULL urls
    through (the exact_dedup NULL posture); host_profile's arithmetic
    ties out (n_dup_docs = n_docs - n_urls) and www/no-www roll up to
    one host while their canonical URLs stay distinct."""
    from albedo_spark.operators.dedup import host_profile, url_dedup

    rows = [
        (1, "http://www.a.com/x?utm_source=s"),
        (2, "HTTP://WWW.A.com/x/"),           # same canonical as 1
        (3, "http://a.com/x"),                # no-www: distinct URL, same host
        (4, "http://b.com/y"),
        (5, None),                            # passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {r.doc_id for r in url_dedup(df).collect()}
    assert kept == {1, 3, 4, 5}  # 2 deduped into 1; NULL kept
    prof = {r.host: (r.n_docs, r.n_urls, r.n_dup_docs)
            for r in host_profile(df).collect()}
    assert prof["a.com"] == (3, 2, 1)  # www+no-www one host, 2 urls, 1 dup
    assert prof["b.com"] == (1, 1, 0)


def test_host_cap_sample_two_phase_exact(spark):
    """host_cap_sample keeps at most cap docs per host, chosen by
    md5(host:id) order; the salted two-phase ranking must equal the
    single exact window on a deliberately SKEWED fixture (one giant
    host — the case the salting exists for), and NULL urls pass
    through uncapped."""
    from pyspark.sql import Window

    from albedo_spark.functions.urls import url_host
    from albedo_spark.operators.dedup import host_cap_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 1700, F.lit("http://Giant.example.com/p")
        ).when(
            F.col("id") < 1990,
            F.concat(F.lit("http://small"), (F.col("id") % 7).cast("string"),
                     F.lit(".example.com/p")),
        ).otherwise(F.lit(None).cast("string")).alias("url"),
    )
    kept = host_cap_sample(df, cap=25, num_salts=8)
    hosts = kept.where(F.col("url").isNotNull()).select(
        url_host(F.col("url")).alias("h"), "doc_id"
    )
    counts = {r.h: r.n for r in hosts.groupBy("h").agg(F.count("*").alias("n")).collect()}
    assert counts["giant.example.com"] == 25
    assert all(v <= 25 for v in counts.values())
    # NULLs uncapped
    assert kept.where(F.col("url").isNull()).count() == 10
    # two-phase == exact single-window selection
    exact_w = Window.partitionBy("h").orderBy(F.col("k").asc(), F.col("doc_id").asc())
    exact = (
        df.where(F.col("url").isNotNull())
        .select("doc_id", url_host(F.col("url")).alias("h"))
        .withColumn("k", F.md5(F.concat("h", F.lit(":"), F.col("doc_id").cast("string"))))
        .withColumn("r", F.row_number().over(exact_w))
        .where(F.col("r") <= 25)
    )
    assert {r.doc_id for r in hosts.collect()} == {r.doc_id for r in exact.collect()}
    # determinism
    again = {r.doc_id for r in host_cap_sample(df, cap=25, num_salts=8)
             .where(F.col("url").isNotNull()).collect()}
    assert again == {r.doc_id for r in hosts.collect()}
