"""Full-text retrieval operators: BIGINT-exact BM25 top-k search.

Not in the reference as an operator — but it is the reference's REASON for
its Elasticsearch dependency (``S/recommenders/ContentRecommender.scala``
queries ES with more-like-this, i.e. BM25 under the hood;
``app/mappings.py:26-64`` defines the index). The §7.4 rewrite replaced the
per-user ES round-trip with an inverted-index join; this module completes
that story by exposing the scoring function itself, Spark-first: the
inverted index is a DataFrame, the queries are a broadcast frame, and the
ranking is one partial-aggregated shuffle + the pinned top-k window idiom.

Scoring contract (fixed, part of the oracle): Okapi BM25 with k1 = 6/5 and
b = 3/4 expressed as EXACT BIGINT rational arithmetic, and a log-free
rational idf — the raw Robertson–Spärck Jones odds ``(N - df + 1/2) /
(df + 1/2)`` scaled ×10⁴ with floor division, instead of its logarithm:

- ``ln`` is the one sub-expression whose last bit Java and C libms may
  disagree on; everything else here is integer, so dropping it makes the
  whole score an order-independent BIGINT sum that hash-matches across
  engines (the q105/q121 discipline).
- Per single-term scoring the mapping idf → odds is monotone, so one-term
  rankings are unchanged; multi-term SUMS can rank differently from
  log-BM25 (documented trade). Swap in ``F.log`` for production ranking
  quality — the plan shape is identical.

All per-row arithmetic is bounded by per-document quantities (tf, dl,
avgdl_x100, df, N) — no corpus-total appears in a product — so the BIGINT
headroom survives 10¹¹-document corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from albedo_spark.operators.dedup import normalize_text
from albedo_spark.operators.textstats import tokens


def bm25_search(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Top-k documents per query under BIGINT-exact BM25 (k1=6/5, b=3/4).

    ``queries`` is a small literal list of ``(query_id, query_text)`` —
    query-side data is broadcast-scale by definition (a search workload's
    queries are not the corpus). Query term multiplicity is ignored
    (distinct terms per query, the usual BM25 practice).

    Integer scoring chain (both engines replay it exactly):

    - ``avgdl_x100 = (100 * T) DIV N`` — one corpus scalar (T total tokens,
      N docs with ≥1 token).
    - ``idf_x10k = (10^4 * (2N - 2df + 1)) DIV (2df + 1)`` — the RSJ odds
      ``(N-df+0.5)/(df+0.5)`` as an exact integer rational.
    - ``tfpart_x10k = (10^4 * 22 * tf * avgdl_x100)
      DIV (10*tf*avgdl_x100 + 3*avgdl_x100 + 900*dl)`` — algebraically
      ``tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)`` ×10⁴ with every
      denominator cleared (k1+1 = 11/5, k1(1-b) = 3/10, k1·b = 9/10).
    - per-term score = ``(idf_x10k * tfpart_x10k) DIV 10^4``; per-(query,
      doc) score = the SUM of term scores — an integer sum, order-free.

    Plan shape at 100 TB: ONE token explode over the corpus feeding ONE
    (doc, word) aggregate — the posting list — which is lazily
    checkpointed because doc-length, document-frequency and the corpus
    scalar all derive from it (the q126/encode_corpus multi-reference
    discipline). Query terms broadcast into the posting list, so only the
    postings of queried terms flow into scoring; the per-(query, doc) sum
    partial-aggregates map-side; ranking is the pinned row_number idiom
    (deterministic tie-break on doc id). Nothing leaves the JVM.
    """
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
    )
    # Posting list (doc, word, tf): the single corpus-wide shuffle. Four
    # downstream references (dl, df, corpus scalars, scoring join) — lazy
    # localCheckpoint so the explode runs once, released with the result.
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("_t")
    ).select("n_docs", F.expr("(100 * _t) div n_docs").alias("avgdl_x100"))

    qterms = (
        spark.createDataFrame(queries, ["query_id", "_qtext"])
        .select(
            "query_id",
            F.explode(F.array_distinct(F.split(normalize_text(F.col("_qtext")), " "))).alias("w"),
        )
        .where(F.col("w") != "")
    )

    # BIGINT floor division via SQL `div` (the q121 idiom) — `/` would be
    # double division and break exactness past 2^53.
    idf_x10k = F.expr("(10000 * (2*n_docs - 2*df + 1)) div (2*df + 1)")
    tfpart_x10k = F.expr(
        "(10000 * 22 * tf * avgdl_x100)"
        " div (10*tf*avgdl_x100 + 3*avgdl_x100 + 900*dl)"
    )
    scored = (
        tf.join(F.broadcast(qterms), "w")
        .join(F.broadcast(dfreq.join(F.broadcast(qterms.select("w").distinct()), "w")), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("_idf_x10k", idf_x10k)
        .withColumn("_tfpart_x10k", tfpart_x10k)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.expr("(_idf_x10k * _tfpart_x10k) div 10000")).alias("bm25_x10k")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_x10k").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rank", "bm25_x10k")
    )


def build_bm25_store(
    docs: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 16,
    forward: bool = False,
) -> None:
    """Persist the BM25 inverted index — the lexical member of the
    persisted-store family (digest q92 / MinHash q90 / vector q93 / PQ
    q153; this is the store the reference keeps in Elasticsearch).
    One corpus pass builds the posting list and DENORMALIZES everything
    scoring needs onto each row — ``(w, doc_id, tf, dl, df)`` — so a
    probe is ONE equi-join, no star schema: doc length and document
    frequency are per-row integers, and the two corpus scalars
    ``(n_docs, avgdl_x100)`` freeze as the ``{table}_stats`` companion
    (the ``_cents`` frozen-model contract: scoring statistics are part
    of the index and may not drift under a reader). Bucketed on ``w`` —
    the probe key — so the store side of every search has ZERO Exchange.
    Rebuild to refresh; the classic index-maintenance posture.

    ``forward=True`` additionally persists the SAME rows as the
    ``{table}_fwd`` companion bucketed on ``doc_id`` — the forward
    index. PRF's feedback fetch (``bm25_store_prf_search``) is keyed on
    doc ids, so against the ``w``-bucketed postings it must scan the
    whole table; the forward companion gives that fetch a
    bucket-pruned path (the classic postings+forward dual every search
    engine keeps). Costs one extra write of the index size."""
    from albedo_spark.io import drop_orphan_table_location, write_bucketed

    from albedo_spark.io import widen

    spark = docs.sparkSession
    toks = (
        widen(
            docs.where(F.col(text_col).isNotNull()).select(
                F.col(id_col), F.col(text_col)
            )
        )
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        )
        .where(F.col("w") != "")
    )
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)  # consumers: dl, df, stats, rows
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    # Stats are per-GENERATION rows (r13): (gen, n_docs, dl_total,
    # avgdl_x100). A fresh build is generation 0; each
    # append_bm25_postings adds one row. dl_total makes the corpus
    # scalars MERGEABLE at read — merged avgdl_x100 =
    # (100 * sum(dl_total)) div sum(n_docs) is exactly the value a
    # from-scratch rebuild would freeze, which is what keeps
    # multi-generation search byte-identical to a rebuilt store.
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("_t")
    ).select(
        F.lit(0).cast("long").alias("gen"),
        "n_docs",
        F.col("_t").alias("dl_total"),
        F.expr("(100 * _t) div n_docs").alias("avgdl_x100"),
    )
    spark.sql(f"DROP TABLE IF EXISTS `{table}_stats`")
    drop_orphan_table_location(spark, table + "_stats")
    stats.write.mode("overwrite").format("parquet").saveAsTable(
        table + "_stats"
    )
    rows = tf.join(dl, "doc_id").join(dfreq, "w").select(
        "w", "doc_id", "tf", "dl", "df"
    ).localCheckpoint(eager=False)
    write_bucketed(rows, table, "w", num_buckets=num_buckets)
    if forward:
        write_bucketed(
            rows, table + "_fwd", "doc_id", num_buckets=num_buckets
        )
    else:
        # A rebuild without the forward companion must never leave a
        # STALE one behind: bm25_store_prf_search auto-prefers
        # `{table}_fwd` when it exists, so an orphan from an earlier
        # forward=True build would feed PRF feedback tf rows from the
        # OLD corpus, breaking the byte-identical-fallback contract.
        spark.sql(f"DROP TABLE IF EXISTS `{table}_fwd`")
        drop_orphan_table_location(spark, table + "_fwd")


def _table_num_buckets(spark: SparkSession, table: str) -> int:
    """Catalog-derived bucket count — the shared ``io.table_num_buckets``
    (factored out in r14 so the PQ appender uses the same source of
    truth instead of a caller-guessed count, ADVICE r13 #4)."""
    from albedo_spark.io import table_num_buckets

    return table_num_buckets(spark, table)


def append_bm25_postings(
    docs: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Add a new document batch to a persisted BM25 store as one
    GENERATION — the lexical store's member of the family's
    append/streaming posture (digest q92 / MinHash q90 / vector q93 /
    PQ q153 all had one; until r13 this store was rebuild-only because
    df was denormalized per row). Lucene's segment model, DataFrame-
    first: the batch's posting rows land as an append into the same
    w-bucketed table (layout property survives), its corpus scalars as
    one more ``{table}_stats`` row, and readers merge — summed n_docs /
    dl_total reproduce the rebuilt store's scalars exactly, and
    corpus-level df is recomputed over the (candidate-bounded) matched
    postings, so search over build+append is BYTE-IDENTICAL to search
    over a from-scratch rebuild (pinned in tests). The per-row df
    written here is the segment-local count — correct while the store
    has one generation, superseded by the read-side recompute once it
    has more, folded back by ``compact_bm25_store``.

    Replay-idempotent via the shared ``admit_novel`` core: only
    never-seen doc ids contribute (the ``{table}_bloom`` sidecar, when
    present, keeps that probe O(batch)); the bloom mirror advances
    BEFORE the row write (bloom-without-rows is a harmless false
    positive; the reverse would re-admit). The ``{table}_fwd`` forward
    companion, when present, receives the same rows so PRF's
    bucket-pruned fetch stays complete.

    Crash safety (ADVICE r13 #1): the write order is bloom → postings →
    forward → stats, so a crash can strand a generation's posting rows
    without their stats row (and/or forward rows) — and because the
    replay guard then admits nothing, a bare retry would never fill the
    gap. The admitted-0 path therefore runs ``repair_bm25_store``,
    which reconstructs any missing stats row from exact posting-derived
    deltas and re-mirrors missing forward rows, so the replay the
    at-least-once contract already guarantees is also the repair.
    Returns ``{admitted, generation}`` plus, on the admitted-0 path,
    the ``repair`` report."""
    from albedo_spark.operators.vector_store import admit_novel, mirror_bloom

    spark = docs.sparkSession
    if not spark.catalog.tableExists(table):
        raise ValueError(
            f"BM25 store `{table}` does not exist — build_bm25_store first"
        )
    stats_raw = spark.table(table + "_stats")
    if "gen" not in stats_raw.columns:
        raise ValueError(
            f"`{table}` predates the generation layout — rebuild with "
            "build_bm25_store before appending"
        )
    batch = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    novel = admit_novel(batch, table, id_col="doc_id").localCheckpoint()
    n_novel = novel.count()
    if n_novel == 0:
        # An admitted-0 NON-EMPTY batch is either a clean replay or the
        # replay after a crash inside a previous append's multi-table
        # write window (postings landed, stats row and/or forward rows
        # did not — ADVICE r13 #1: without this, that orphan generation
        # is permanent, because the replay-guard makes every retry a
        # no-op). Detect-and-repair exactly here, the first moment the
        # at-least-once contract replays the batch; a clean replay pays
        # one posting-scan aggregate and repairs nothing.
        repair = (
            repair_bm25_store(spark, table)
            if not batch.isEmpty()
            else None
        )
        return {"admitted": 0, "generation": None, "repair": repair}
    tf = (
        novel.select(
            "doc_id", F.explode(tokens(F.col("_text"))).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)  # consumers: dl, df, stats, rows
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    stats_row = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("_t")
    ).first()
    mirror_bloom(novel.select("doc_id"), table, id_col="doc_id")
    if not stats_row["n_docs"]:
        # Every admitted doc tokenized to nothing: no postings, no stats
        # contribution — identical to a rebuild, which would not count
        # token-free docs either. The bloom mirror above still records
        # the ids so replays skip them.
        return {"admitted": n_novel, "generation": None}
    gen = stats_raw.agg(F.max("gen")).first()[0] + 1
    nb = _table_num_buckets(spark, table)
    rows = tf.join(dl, "doc_id").join(dfreq, "w").select(
        "w", "doc_id", "tf", "dl", "df"
    ).localCheckpoint(eager=False)
    (
        rows.write.mode("append")
        .bucketBy(nb, "w")
        .sortBy("w")
        .format("parquet")
        .saveAsTable(table)
    )
    if spark.catalog.tableExists(table + "_fwd"):
        (
            rows.write.mode("append")
            .bucketBy(nb, "doc_id")
            .sortBy("doc_id")
            .format("parquet")
            .saveAsTable(table + "_fwd")
        )
    spark.createDataFrame(
        [(int(gen), int(stats_row["n_docs"]), int(stats_row["_t"]),
          (100 * int(stats_row["_t"])) // int(stats_row["n_docs"]))],
        "gen long, n_docs bigint, dl_total bigint, avgdl_x100 bigint",
    ).write.mode("append").format("parquet").saveAsTable(table + "_stats")
    return {"admitted": n_novel, "generation": int(gen)}


def compact_bm25_store(spark: SparkSession, table: str) -> dict:
    """Fold a multi-generation BM25 store back to single-generation —
    the maintenance pass that retires the read-side df recompute and
    the per-append small files in one rewrite (``io.compact_table``'s
    role, plus the df fold that generic row-preserving compaction
    cannot do). Corpus-level df is recomputed over the full posting set
    (one bucketed-scan aggregate on w — no Exchange), stats rows merge
    into one generation-0 row with the exact summed scalars, and the
    ``{table}_fwd`` companion (when present) is rewritten from the same
    frame.

    Swap discipline = ``compact_table``'s pid-suffixed private-copy
    protocol, extended to the store's three members (VERDICT r13 #5):
    every member is fully written as ``{table}__c<pid>{suffix}`` FIRST,
    then published by DROP + RENAME in the order postings → forward →
    stats. Stats go LAST because that ordering's crash windows are the
    benign ones: new postings under old multi-generation stats still
    read correctly (the multi-gen path recomputes df and merges stats
    by exact sums, which compaction preserves), whereas a new
    single-row stats table over old postings would silently trust
    stale segment-local df. Entry runs AUTOMATED recovery: a stranded
    private member whose published name is GONE (crash landed between
    its DROP and RENAME) is ADOPTED back; private members alongside
    live published names are pre-DROP debris and are dropped —
    ``io.sweep_dead_private_copies`` covers the same names (the
    ``__c<pid>_stats``/``__c<pid>_fwd`` forms match its pattern) for
    sessions that died without re-running the compact. At 100 TB on
    Iceberg/Delta this whole dance is their transactional compaction
    call. Search results are unchanged by construction (same rows,
    same recomputed statistics a rebuild would produce). Returns
    ``{files_before, files_after, n_docs, adopted}``."""
    import os as _os

    from albedo_spark.io import drop_orphan_table_location, write_bucketed

    members = {"": table, "_fwd": table + "_fwd", "_stats": table + "_stats"}
    # ---- crash recovery BEFORE anything else (see docstring) ----
    pref = f"{table.lower()}__c"
    groups: dict[str, dict[str, str]] = {}
    for t in spark.catalog.listTables():
        if not t.name.startswith(pref):
            continue
        rest = t.name[len(pref):]
        pid, _, suf = rest.partition("_")
        if not pid.isdigit() or ("_" + suf if suf else "") not in members:
            continue
        groups.setdefault(pid, {})["_" + suf if suf else ""] = t.name
    adopted: list[str] = []
    gkeys = sorted(groups)
    for suf, priv in sorted(groups[gkeys[-1]].items()) if gkeys else ():
        if not spark.catalog.tableExists(members[suf]):
            spark.sql(f"ALTER TABLE `{priv}` RENAME TO `{members[suf]}`")
            spark.catalog.refreshTable(members[suf])
            adopted.append(priv)
        else:
            spark.sql(f"DROP TABLE IF EXISTS `{priv}`")
    for k in gkeys[:-1]:
        for priv in groups[k].values():
            spark.sql(f"DROP TABLE IF EXISTS `{priv}`")

    nb = _table_num_buckets(spark, table)
    files_before = len(spark.table(table).inputFiles())
    post = spark.table(table)
    dfreq = post.groupBy("w").agg(F.count("*").alias("df"))
    rows = post.drop("df").join(dfreq, "w").select(
        "w", "doc_id", "tf", "dl", "df"
    ).localCheckpoint()
    stats_raw = spark.table(table + "_stats")
    if "gen" not in stats_raw.columns:
        # legacy layout: dl_total unrecoverable from a frozen avgdl
        raise ValueError(
            f"`{table}` predates the generation layout — rebuild with "
            "build_bm25_store instead of compacting"
        )
    merged = stats_raw.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("dl_total").alias("_t")
    ).first()
    n_docs, dl_total = int(merged["n_docs"]), int(merged["_t"])
    has_fwd = spark.catalog.tableExists(table + "_fwd")
    # ---- private writes: every member complete before any publish ----
    priv = f"{table}__c{_os.getpid()}"
    write_bucketed(rows, priv, "w", num_buckets=nb)
    if has_fwd:
        write_bucketed(rows, priv + "_fwd", "doc_id", num_buckets=nb)
    spark.sql(f"DROP TABLE IF EXISTS `{priv}_stats`")
    drop_orphan_table_location(spark, priv + "_stats")
    spark.createDataFrame(
        [(0, n_docs, dl_total, (100 * dl_total) // n_docs)],
        "gen long, n_docs bigint, dl_total bigint, avgdl_x100 bigint",
    ).write.mode("overwrite").format("parquet").saveAsTable(priv + "_stats")
    # ---- publish: postings -> forward -> stats (stats last) ----
    for suf in ("",) + (("_fwd",) if has_fwd else ()) + ("_stats",):
        spark.sql(f"DROP TABLE IF EXISTS `{members[suf]}`")
        spark.sql(f"ALTER TABLE `{priv}{suf}` RENAME TO `{members[suf]}`")
        spark.catalog.refreshTable(members[suf])
    rows.unpersist()
    return {
        "files_before": files_before,
        "files_after": len(spark.table(table).inputFiles()),
        "n_docs": n_docs,
        "adopted": adopted or None,
    }


def repair_bm25_store(spark: SparkSession, table: str) -> dict:
    """Adopt an ORPHAN GENERATION left by a crash inside
    ``append_bm25_postings``'s multi-table write window (ADVICE r13 #1):
    the append's order is bloom → postings → forward → stats, so a
    crash after the posting commit leaves rows whose doc ids the replay
    guard already knows — every retry is a no-op and the merged
    ``n_docs``/``dl_total`` silently exclude the batch, diverging from a
    rebuild. Reconstruction needs no batch replay because generations
    are doc-disjoint (appends admit novel ids only): the orphan's exact
    scalars are the DELTAS between posting-derived totals and the
    summed stats rows — ``n_docs`` from the distinct-doc count,
    ``dl_total`` from the global tf sum — appended as one more stats
    row. A lagging ``{table}_fwd`` companion (crash between the posting
    and forward writes) is re-mirrored from the postings via exceptAll.

    Cost: one posting-scan aggregate for detection (the audit's own
    arithmetic, ``audit_bm25_store``'s bad_stats_* checks), plus the
    fwd diff only when row counts disagree. Invoked automatically on
    ``append_bm25_postings``'s admitted-0 path — the first replay after
    the crash — and safe to run any time: a consistent store repairs
    nothing. Stats totals EXCEEDING the postings indicate real
    corruption this function cannot invent rows for; that raises with a
    pointer to the audit. Returns ``{repaired, stats_row, fwd_rows}``."""

    stats_raw = spark.table(table + "_stats")
    if "gen" not in stats_raw.columns:
        # Legacy layout predates appends entirely — nothing to repair.
        return {"repaired": False, "stats_row": None, "fwd_rows": 0}
    post = spark.table(table)
    derived = post.groupBy("doc_id").agg(F.min("dl").alias("dl")).agg(
        F.count("*").alias("n"), F.sum("dl").alias("t")
    ).first()
    summed = stats_raw.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n"),
        F.coalesce(F.sum("dl_total"), F.lit(0)).alias("t"),
        F.coalesce(F.max("gen"), F.lit(-1)).alias("g"),
    ).first()
    miss_n = int(derived["n"]) - int(summed["n"])
    miss_t = int(derived["t"]) - int(summed["t"])
    if miss_n < 0 or miss_t < 0 or (miss_n == 0) != (miss_t == 0):
        raise ValueError(
            f"BM25 store `{table}` stats disagree with its postings in a "
            f"shape no crash window produces (n_docs delta {miss_n}, "
            f"dl_total delta {miss_t}) — run audit_bm25_store and rebuild"
        )
    stats_row = None
    if miss_n > 0:
        gen = int(summed["g"]) + 1
        stats_row = (gen, miss_n, miss_t, (100 * miss_t) // miss_n)
        spark.createDataFrame(
            [stats_row],
            "gen long, n_docs bigint, dl_total bigint, avgdl_x100 bigint",
        ).write.mode("append").format("parquet").saveAsTable(table + "_stats")
    fwd_rows = 0
    if spark.catalog.tableExists(table + "_fwd"):
        fwd = spark.table(table + "_fwd")
        if fwd.count() != post.count():
            nb = _table_num_buckets(spark, table + "_fwd")
            missing = post.exceptAll(fwd).localCheckpoint()
            fwd_rows = missing.count()
            if fwd_rows:
                (
                    missing.write.mode("append")
                    .bucketBy(nb, "doc_id")
                    .sortBy("doc_id")
                    .format("parquet")
                    .saveAsTable(table + "_fwd")
                )
    return {
        "repaired": bool(stats_row) or fwd_rows > 0,
        "stats_row": stats_row,
        "fwd_rows": fwd_rows,
    }


def _bm25_read_stats(spark: SparkSession, table: str):
    """Resolve a BM25 store's corpus scalars → (one-row ``(n_docs,
    avgdl_x100)`` frame, multi_gen flag). Single-generation stores (and
    legacy two-column stats tables from before the generation layout)
    pass their frozen row through untouched — the exact bytes every
    existing gate hashes. Multi-generation stores merge by SUM:
    ``n_docs = Σ n_docs``, ``avgdl_x100 = (100·Σ dl_total) div n_docs``
    — identical to what a from-scratch rebuild would freeze, because
    integer division distributes over nothing here (one division, over
    exact sums).

    The stats table is model-state (one row per generation), so it is
    COLLECTED once and re-emitted as a literal frame: the old shape ran
    a ``count()`` driver job per probe AND left a parquet scan inside
    the broadcast build (one more sequential sub-job per probe under
    AQE); one collect replaces both, and the merge arithmetic runs on
    exact Python ints — the same BIGINTs either way (r16, guide §5
    driver does no data work / fewer sequential jobs)."""
    raw = spark.table(table + "_stats")
    legacy = "gen" not in raw.columns
    rows = raw.collect()
    if legacy or len(rows) <= 1:
        vals = [(int(r["n_docs"]), int(r["avgdl_x100"])) for r in rows]
        multi = False
    else:
        n = sum(int(r["n_docs"]) for r in rows)
        t = sum(int(r["dl_total"]) for r in rows)
        vals = [(n, (100 * t) // n)]
        multi = True
    return (
        spark.createDataFrame(vals, "n_docs bigint, avgdl_x100 bigint"),
        multi,
    )


def _bm25_postings(spark: SparkSession, table: str, terms: DataFrame,
                   multi_gen: bool) -> DataFrame:
    """The posting rows a probe scores against, with a CORRECT ``df``
    column. Single-generation: the table itself — df was denormalized
    at build time and is exact (zero extra work, the pinned plan).
    Multi-generation: the per-row df is stale (each segment froze its
    own batch-local count), so corpus-level df is RECOMPUTED over the
    term-matched postings — one bucketed scan filtered by the broadcast
    term list, materialized once (localCheckpoint) and consumed by both
    the df aggregate and the scoring join. Every (w, doc_id) pair
    appears exactly once across generations (append admits novel doc
    ids only), so ``count(*)`` per w over the matched rows IS the
    rebuilt store's df. Cost is candidate-bounded: only queried terms'
    postings flow, never the corpus — the read-side price of append
    until ``compact_bm25_store`` folds the segments."""
    post = spark.table(table)
    if not multi_gen:
        return post
    matched = post.join(
        F.broadcast(terms.select("w").distinct()), "w"
    ).localCheckpoint(eager=False)
    dfreq = matched.groupBy("w").agg(F.count("*").alias("df"))
    return matched.drop("df").join(F.broadcast(dfreq), "w")


def _scoring_postings(
    spark: SparkSession, table: str, terms: DataFrame, multi_gen: bool
) -> tuple[DataFrame, bool]:
    """The posting frame the SCORING fan-out should read, plus whether
    it arrives pre-clustered by doc_id. The fan-out join's dominant
    cost is the per-(query, doc) aggregate over |postings ⋈ qterms|
    rows; grouping keys are (query_id, doc_id), so a scan that is
    hash-partitioned on doc_id already clusters every group into one
    task and the aggregate needs NO exchange — at any corpus size, the
    fan-out stream is never shuffled (guide §2.4 "already co-partitioned
    but not recognised"). The ``{table}_fwd`` companion IS that scan:
    the same rows, bucketed on doc_id. Single-generation stores with a
    forward companion score from it; everything else keeps the
    w-bucketed main table (multi-generation stores recompute df through
    a checkpoint that erases partitioning anyway)."""
    if not multi_gen and spark.catalog.tableExists(table + "_fwd"):
        return spark.table(table + "_fwd"), True
    return _bm25_postings(spark, table, terms, multi_gen), False


def bm25_store_search(
    queries: DataFrame,
    table: str,
    top_k: int = 5,
    query_id_col: str = "query_id",
    text_col: str = "text",
    allow: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 over the PERSISTED index (``build_bm25_store``) for a
    query FRAME ``(query_id, text)`` — the serving half of the lexical
    store, same integer scoring chain as ``bm25_search`` (k1=6/5,
    b=3/4, RSJ rational idf — see the module docstring). Query texts
    tokenize with the index's tokenizer, distinct terms per query (the
    usual BM25 practice). Plan: query terms BROADCAST into the bucketed
    posting table (zero store-side Exchange — only postings of queried
    terms flow), the frozen ``{table}_stats`` scalars ride a broadcast
    cross join, the per-(query, doc) sum partial-aggregates map-side,
    ranking is the pinned row_number idiom.

    ``allow``: optional one-column ``(doc_id)`` frame restricting
    results to a metadata slice — PRE-filter semantics (q164's
    contract: candidates are restricted before ranking, every query
    still fills top_k from survivors). Applied as a broadcast semi-join
    on the posting scan, store side still zero Exchange. idf/avgdl stay
    the INDEX's frozen corpus-level stats (standard filtered-retrieval
    practice — the slice narrows candidates, not the model)."""
    spark = queries.sparkSession
    stats, multi_gen = _bm25_read_stats(spark, table)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(tokens(F.col(text_col)))
            ).alias("w"),
        )
        .where(F.col("w") != "")
    )
    # df recompute (multi-gen only) runs BEFORE the allow filter: idf is
    # the index's corpus-level statistic, never the slice's.
    post, copartitioned = _scoring_postings(spark, table, qterms, multi_gen)
    if allow is not None:
        post = post.join(
            F.broadcast(allow.selectExpr(f"{allow.columns[0]} AS doc_id")),
            "doc_id",
            "semi",
        )
    idf_x10k = F.expr("(10000 * (2*n_docs - 2*df + 1)) div (2*df + 1)")
    tfpart_x10k = F.expr(
        "(10000 * 22 * tf * avgdl_x100)"
        " div (10*tf*avgdl_x100 + 3*avgdl_x100 + 900*dl)"
    )
    # The per-term-per-doc BM25 contribution depends only on the posting
    # row (+ the frozen scalars) — never on the query — so compute it
    # ONCE per posting row BEFORE the query-term join instead of once
    # per joined row. The join fan-out is |matched (q, w, d)| (orders of
    # magnitude more rows than postings whenever queries share
    # high-df terms); moving the integer div chain below the join and
    # projecting to (w, doc_id, contrib) keeps the fan-out stream
    # narrow (guide §2.3). Identical integers, identical sums.
    contrib = (
        post.crossJoin(F.broadcast(stats))
        .withColumn("_idf_x10k", idf_x10k)
        .withColumn("_tfpart_x10k", tfpart_x10k)
        .select(
            "w",
            "doc_id",
            F.expr("(_idf_x10k * _tfpart_x10k) div 10000").alias("_c"),
        )
    )
    # Co-partitioned scoring scan (r16): when the posting frame is the
    # doc_id-bucketed forward companion, its partitioning clusters every
    # (query_id, doc_id) group into one task — the aggregate runs
    # complete, in-task, with ZERO exchange of the fan-out stream, and a
    # balancing round-robin would DESTROY that property. Only the
    # w-bucketed fallback keeps the r15 widen (its fan-out aggregate
    # must shuffle regardless, so balancing the scan is free win there).
    if not copartitioned:
        from albedo_spark.io import widen

        contrib = widen(contrib)
    scored = (
        contrib.join(F.broadcast(qterms), "w")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("bm25_x10k"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_x10k").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rank", "bm25_x10k")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    top_k: int = 10,
    k_const: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings → ``(query_id,
    doc_id, n_legs, rrf_x1e6, rank)`` — the standard hybrid-search
    combiner (Cormack, Clarke & Büttcher 2009): each leg contributes
    ``1/(k + rank)``, here as the exact BIGINT ``10^6 div (k + rank)``
    so the fused score is an order-independent integer sum both engines
    hash identically (k = 60, the paper's constant). RRF needs only
    RANKS from each leg — BM25 points and cosine floats never have to be
    calibrated against each other, which is exactly why it is the
    default fusion in hybrid lexical+dense retrieval.

    Inputs are whatever each leg's operator emitted (``bm25_search``,
    ``cosine_knn``, ``quantized_knn``…) as long as they carry (query,
    doc, rank) under the given names; ``n_legs`` reports how many legs
    ranked the doc (a doc missing from a leg simply contributes 0 —
    the fusion semantics, not an outer-join artifact).

    Plan at scale: each leg is already a per-query top-k (bounded:
    |queries| × k rows), so the fusion input is broadcast-scale no
    matter the corpus; one union + one tiny grouped sum + the pinned
    row_number idiom (fused desc, doc asc). The heavy lifting stays
    inside the legs, where each index (postings, ANN buckets) does its
    own pruning."""
    legs = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.expr(f"1000000 div ({k_const} + {rank_col})").alias("_c"),
        )
        for r in rankings
    ]
    allc = legs[0]
    for nxt in legs[1:]:
        allc = allc.unionByName(nxt)
    fused = allc.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_legs"),
        F.sum("_c").alias("rrf_x1e6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_x1e6").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "n_legs", "rrf_x1e6", "rank")
    )


def corpus_phrase_dictionary(
    docs: DataFrame,
    bigrams: int = 8,
    trigrams: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """``(phrase_id, pt array<string>)`` — a deterministic self-derived
    phrase dictionary: the top-``bigrams`` 2-grams (ids 0..) and
    top-``trigrams`` 3-grams (ids 100..) by (count desc, tokens asc).
    Exists so the matcher below is gateable against a corpus-derived
    dictionary; production passes its own blocklist/phrase frame in the
    same ``(phrase_id, pt)`` shape."""
    from albedo_spark.operators.textstats import tokens

    from albedo_spark.io import widen

    toks = widen(docs.select(F.col(text_col))).select(
        tokens(F.col(text_col)).alias("w")
    ).where(F.size("w") >= 2)

    def top_ngrams(n: int, k: int, id_base: int) -> DataFrame:
        from pyspark.sql import Window

        # Filter per n-gram length HERE, not only at the shared `toks`
        # level: a doc with exactly 2 tokens must not reach n=3, where
        # sequence(0, size(w)-3) = sequence(0, -1) DESCENDS in Spark and
        # slice(w, 0, 3) then throws INVALID_PARAMETER_VALUE.START. The
        # SQL-oracle twin (range(len(w)-n+1)) yields empty rows for the
        # same doc, so without this guard the engines diverge (crash vs
        # results) on legitimate corpora.
        grams = toks.where(F.size("w") >= n).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.slice("w", i + 1, n),
                )
            ).alias("pt")
        )
        counted = grams.groupBy("pt").agg(F.count("*").alias("c"))
        w = Window.orderBy(F.col("c").desc(), F.col("pt").asc())
        return (
            counted.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select((F.col("rk") - 1 + id_base).alias("phrase_id"), "pt")
        )

    return top_ngrams(2, bigrams, 0).unionByName(top_ngrams(3, trigrams, 100))


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "first",
) -> DataFrame:
    """Big-dictionary multi-phrase matcher — the scale path when the
    blocklist/phrase set is too large to fold into one regex (q116's
    OR-fold is the small-dictionary case; a 10⁶-phrase dictionary as a
    regex is neither compilable nor pushable). Relational matching
    instead: every dictionary phrase posts on its FIRST token, document
    token positions equi-join the postings (candidates are bounded by
    the posting frequency of first tokens — in production key on each
    phrase's RAREST corpus token for the tightest candidate set; first
    token keeps the oracle replay trivial), and a slice-equality verify
    against the document's token array confirms the full phrase.
    Returns ``(doc_id, phrase_id, n_occurrences, first_pos)`` —
    positions 0-based; overlapping occurrences all count.

    Plan: the phrase frame is model-state-sized → broadcast both the
    posting join and nothing else; candidates shuffle ONCE on doc_id to
    meet the token arrays; the per-(doc, phrase) count is map-side
    combinable. No regex, no UDF, no |docs|×|phrases| product.

    ``key="rarest"`` posts each phrase on its RAREST corpus token (df
    asc, token asc — deterministic) at a fixed in-phrase offset instead
    of token 1: one extra df pass over the corpus buys the tightest
    candidate set when phrases lead with stopwords ("of the", "in a" —
    first-token postings explode on exactly those). Results are
    IDENTICAL either way (pinned by a pytest equivalence property) —
    the keying only moves candidate-set size."""
    from albedo_spark.operators.textstats import tokens

    if key not in ("first", "rarest"):
        raise ValueError(f"key must be 'first' or 'rarest', got {key!r}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w")
    ).where(F.size("w") >= 1)
    pos_toks = toks.select("doc_id", F.posexplode("w").alias("pos", "tok"))
    if key == "first":
        ph = phrases.select(
            "phrase_id",
            "pt",
            F.element_at("pt", 1).alias("tok"),
            F.lit(0).alias("off"),
            F.size("pt").alias("n"),
        )
    else:
        df_tbl = (
            pos_toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
        )
        ptoks = phrases.select(
            "phrase_id", "pt", F.posexplode("pt").alias("off", "tok")
        )
        # unseen tokens get df = +inf surrogate so a phrase containing one
        # still posts on a SEEN token when it has any (an all-unseen
        # phrase can never match anyway)
        scored = ptoks.join(df_tbl, "tok", "left").select(
            "phrase_id",
            "pt",
            "off",
            "tok",
            F.coalesce("df", F.lit(2**62)).alias("df"),
        )
        ph = (
            scored.groupBy("phrase_id")
            .agg(
                F.min(F.struct("df", "tok", "off", "pt")).alias("b"),
            )
            .select(
                "phrase_id",
                F.col("b.pt").alias("pt"),
                F.col("b.tok").alias("tok"),
                F.col("b.off").alias("off"),
                F.size("b.pt").alias("n"),
            )
        )
    cand = pos_toks.join(F.broadcast(ph), "tok").select(
        "doc_id",
        (F.col("pos") - F.col("off")).alias("pos"),
        "phrase_id",
        "n",
        "pt",
    ).where(F.col("pos") >= 0)
    verified = cand.join(toks, "doc_id").where(
        F.slice("w", F.col("pos") + 1, F.col("n")) == F.col("pt")
    )
    return verified.groupBy("doc_id", "phrase_id").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.min("pos").cast("long").alias("first_pos"),
    )


#: Literal-isin feedback-fetch ceiling: below this many (query, doc)
#: pairs the PRF fetch collects them and bucket-prunes the forward
#: companion; above it the lazy broadcast-join path costs less than a
#: thousands-element In expression plus an extra driver job.
_FETCH_IDS_MAX = 1024


def bm25_store_prf_search(
    queries: DataFrame,
    table: str,
    top_k: int = 5,
    fb_docs: int = 3,
    fb_terms: int = 5,
    orig_weight: int = 2,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback BM25 over the persisted index — the
    RM3-style query-expansion rung (Lavrenko & Croft 2001; Abdul-Jaleel
    et al. 2004's RM3 — public method) of the lexical serving stack,
    kept exact-integer: (1) a first BM25 pass retrieves each query's
    ``fb_docs`` feedback documents; (2) the ``fb_terms`` heaviest terms
    of the feedback set (by summed stored tf, ties on the term) that are
    NOT already query terms become expansion terms; (3) the second pass
    scores ``orig_weight``·original + 1·expansion per-term BM25 — the
    weight multiplies INSIDE the sum, so the result is one BIGINT both
    engines replay.

    Plan: pass 1 is the ``bm25_store_search`` probe shape (broadcast
    terms into the bucketed posting scan, zero store-side Exchange),
    inlined so its PRE-RANK (query, doc) aggregate can be reused. The
    feedback fetch joins the |Q|·fb_docs doc ids (a broadcast, by
    construction) against the ``{table}_fwd`` FORWARD companion when
    the store was built with ``forward=True`` (doc_id-bucketed — the
    fetch's own key), falling back to one scan of the posting table
    otherwise (the documented RM3 price; both paths read the same rows,
    so results are byte-identical — pinned in tests). The final score
    does NOT re-fan-out the original query terms: per-term weights are
    constant within each leg, so ``prf = orig_weight·Σ_orig c +
    Σ_exp c`` — the first summand IS pass 1's aggregate (an exact
    BIGINT identity: the weight multiplies a sum of integers), and only
    the (tiny) expansion term set pays a second posting fan-out. One
    union + re-aggregate replaces the second full |Q·terms| join.
    """
    from albedo_spark.io import widen
    from albedo_spark.operators.topk import top_k_per_group

    spark = queries.sparkSession
    fwd = (
        spark.table(table + "_fwd")
        if spark.catalog.tableExists(table + "_fwd")
        else spark.table(table)
    )
    stats, multi_gen = _bm25_read_stats(spark, table)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("w"),
        )
        .where(F.col("w") != "")
        # consumed by pass-1 scoring and the expansion anti-join
        .localCheckpoint(eager=False)
    )
    idf_x10k = F.expr("(10000 * (2*n_docs - 2*df + 1)) div (2*df + 1)")
    tfpart_x10k = F.expr(
        "(10000 * 22 * tf * avgdl_x100)"
        " div (10*tf*avgdl_x100 + 3*avgdl_x100 + 900*dl)"
    )

    def _contrib(terms: DataFrame) -> DataFrame:
        # Per-posting BM25 contribution, computed BEFORE the query-term
        # join (depends only on the posting row + frozen scalars) and
        # projected narrow — the bm25_store_search discipline (§2.3).
        # Scoring reads the doc_id-bucketed forward companion when it
        # exists (r16, _scoring_postings): the (query, doc) aggregate
        # over the fan-out then needs NO exchange at any scale, and the
        # balancing widen must not run (it would erase the clustering).
        post, copart = _scoring_postings(spark, table, terms, multi_gen)
        out = (
            post.crossJoin(F.broadcast(stats))
            .withColumn("_idf_x10k", idf_x10k)
            .withColumn("_tfpart_x10k", tfpart_x10k)
            .select(
                "w",
                "doc_id",
                F.expr("(_idf_x10k * _tfpart_x10k) div 10000").alias("_c"),
            )
        )
        return out if copart else widen(out)

    # Pass 1, pre-rank: Σ over original terms per (query, doc). Consumed
    # by the feedback top-k below AND by the final score — checkpoint so
    # the posting fan-out aggregate executes once.
    scored1 = (
        _contrib(qterms)
        .join(F.broadcast(qterms), "w")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("_s1"))
        .localCheckpoint(eager=False)
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("_s1").desc(), F.col("doc_id").asc()
    )
    pass1 = (
        scored1.withColumn("rank", F.row_number().over(w1))
        .where(F.col("rank") <= fb_docs)
        .select("query_id", "doc_id")
    )
    # Path decision from the QUERY FRAME's size (one cheap count of the
    # small side), never from pass 1 — deciding after retrieval would
    # force an eager pass-1 job on every call, and the analytical path
    # wants pass 1 left fully lazy inside the one fused plan. The probe
    # is BOUNDED (r14, judged r13 #3): only "more queries than the
    # literal path could take?" matters, so count stops at the first
    # row past the threshold instead of counting an analytical frame
    # exactly — the serving path's extra driver job stays O(threshold)
    # however large the query set.
    _route_limit = _FETCH_IDS_MAX // fb_docs + 1
    use_literal_fetch = (
        spark.catalog.tableExists(table + "_fwd")
        and queries.limit(_route_limit).count() * fb_docs <= _FETCH_IDS_MAX
    )
    if use_literal_fetch:
        # Bucket-pruned fetch (r13): when the feedback set is SMALL
        # (interactive serving — a handful of queries x fb_docs ids),
        # COLLECT the pairs (the bounded A7 idiom) and filter the
        # doc_id-bucketed companion with a LITERAL isin — the one
        # predicate form Spark's bucket pruning accepts
        # (SelectedBucketsCount in the scan, plan-pinned), plus parquet
        # row-group skipping on the sorted files. A broadcast join here
        # would scan every bucket; this reads only the feedback docs'
        # buckets no matter how large the index grows
        # (tools/scale_bm25_fetch.py measures it flat). ANALYTICAL query
        # frames (thousands of queries) take the lazy-join branch below
        # instead — a thousands-element In expression bloats codegen,
        # the collect adds a driver job, and one fwd scan amortized
        # across the whole query set is cheaper per query. Both paths
        # read the same rows — byte-identical results.
        pairs = [
            (r["query_id"], r["doc_id"])
            for r in pass1.select("query_id", "doc_id").collect()
        ]
        # Both element types DERIVED from the frames they came from
        # (ADVICE r13 #3): build_bm25_store accepts any id_col type, and
        # a hardcoded `doc_id long` made a string-id store work on the
        # lazy-join path yet fail in createDataFrame here — behavior
        # that depended on the route probe.
        fb_pairs = spark.createDataFrame(
            pairs or [(None, None)],
            f"query_id "
            f"{queries.schema[query_id_col].dataType.simpleString()},"
            f" doc_id {fwd.schema['doc_id'].dataType.simpleString()}",
        ).where(F.col("doc_id").isNotNull())
        ids = [p[1] for p in pairs]
        fetched = fwd.where(
            F.col("doc_id").isin(ids) if ids else F.lit(False)
        ).join(F.broadcast(fb_pairs), "doc_id")
    else:
        fetched = fwd.join(
            F.broadcast(pass1.select("query_id", "doc_id")), "doc_id"
        )
    fb = (
        fetched.groupBy("query_id", "w")
        .agg(F.sum("tf").alias("fbtf"))
        .join(qterms, ["query_id", "w"], "left_anti")
    )
    fbtop = top_k_per_group(
        fb, ["query_id"], [F.col("fbtf").desc(), F.col("w").asc()], fb_terms
    )
    # ``exp_terms`` is consumed by TWO broadcast builds below (the
    # term-distinct semi-join inside _bm25_postings on multi-gen stores
    # and the score join), and broadcast builds do not share work —
    # without a materialization boundary the whole feedback subtree
    # (the fwd fetch, the fbtf window) would execute once per build.
    # One lazy localCheckpoint; the frame is tiny (|Q|·fb_terms rows).
    exp_terms = (
        fbtop.select("query_id", "w").localCheckpoint(eager=False)
    )
    # Expansion-term contributions only: the original terms' summand is
    # already in ``scored1`` — re-fanning them out would repeat the
    # dominant |postings ⋈ qterms| join for rows whose sum exists.
    exp_scored = (
        _contrib(exp_terms)
        .join(F.broadcast(exp_terms), "w")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("_s2"))
    )
    # prf(q, d) = orig_weight·Σ_orig c + 1·Σ_exp c. Expansion terms are
    # never original terms (the anti-join above), so the two legs
    # partition the expanded-term set and a union + sum is the exact
    # weighted aggregate — the same BIGINTs, never recomputed.
    # The union is repartitioned on query_id BEFORE the grouped sum:
    # hash(query_id) satisfies both the (query_id, doc_id) aggregate AND
    # the ranking window's partitioning, so ONE exchange of the |pairs|
    # stream serves both where the default plan paid two (guide §2.4
    # "two operations keyed the same way share one exchange").
    scored = (
        scored1.select(
            "query_id",
            "doc_id",
            (F.lit(orig_weight) * F.col("_s1")).alias("_p"),
        )
        .unionByName(exp_scored.select("query_id", "doc_id", F.col("_s2").alias("_p")))
        .repartition("query_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_p").alias("prf_x10k"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("prf_x10k").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rank", "prf_x10k")
    )


def snippet_windows(
    docs: DataFrame,
    queries: DataFrame,
    hits: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Passage selection — the snippet/highlight stage every search
    serving stack runs after ranking (and the passage picker a RAG
    pipeline runs before generation): for each ``hits`` pair
    ``(query_id, doc_id)``, the best ``window``-token span of the
    document by MATCHED QUERY-TERM COUNT, ties to the earliest span.
    Returns ``(query_id, doc_id, window_start, n_matches, snippet)``
    with 0-based ``window_start`` and the span's tokens re-joined.

    The optimal span provably starts AT a match position (sliding left
    to the next match never loses a term), so the search space is match
    positions, not all offsets: per candidate pair, each match counts
    the matches within ``[pos, pos + window)`` via ONE analytic window
    (``orderBy(pos).rangeBetween(0, window-1)``) — integer-exact, no
    UDFs. Plan: hits and query terms ride broadcasts into the tokenized
    candidate docs (only hit docs tokenize — candidate-bounded, never
    the corpus); the single shuffle keys the analytic window on
    (query_id, doc_id); the pinned row_number idiom picks the span."""
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    cand = (
        docs.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w")
        )
        .join(
            F.broadcast(hits.select("query_id", "doc_id").distinct()),
            "doc_id",
        )
    )
    pos = cand.select(
        "query_id", "doc_id", "_w", F.posexplode("_w").alias("pos", "tok")
    )
    matches = pos.join(F.broadcast(qterms), ["query_id", "tok"])
    w = (
        Window.partitionBy("query_id", "doc_id")
        .orderBy("pos")
        .rangeBetween(0, window - 1)
    )
    scored = matches.withColumn("n_matches", F.count("*").over(w))
    rank_w = Window.partitionBy("query_id", "doc_id").orderBy(
        F.col("n_matches").desc(), F.col("pos").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(rank_w))
        .where(F.col("_rn") == 1)
        .select(
            "query_id",
            "doc_id",
            F.col("pos").cast("long").alias("window_start"),
            F.col("n_matches").cast("long").alias("n_matches"),
            F.array_join(
                F.slice("_w", F.col("pos") + 1, window), " "
            ).alias("snippet"),
        )
    )


def audit_bm25_store(spark: SparkSession, table: str) -> dict:
    """Integrity audit of a persisted BM25 store — the fsck of the
    lexical index, for operators running the append/compact lifecycle:
    recomputes every invariant the readers rely on from the posting
    rows themselves and reports violations instead of serving wrong
    scores silently.

    Checks (each a counter; ``ok`` iff all zero):
    - ``bad_dl``: docs whose denormalized per-row dl disagrees with the
      sum of their tf (or varies across the doc's rows);
    - ``bad_stats_docs`` / ``bad_stats_dl``: generation-summed n_docs /
      dl_total vs the posting-derived distinct-doc count / global tf
      sum — the merge arithmetic readers trust;
    - ``bad_avgdl``: stats rows where avgdl_x100 != (100·dl_total) div
      n_docs;
    - ``bad_df``: single-generation only — per-row df vs the true
      per-term row count (multi-generation stores carry stale
      segment-local df BY DESIGN and readers recompute, so the audit
      reports ``df_recompute_required`` instead of failing);
    - ``fwd_mismatch``: forward companion not row-for-row equal to the
      postings (when present).

    One pass over the postings per check, all bucketed-scan aggregates
    — audit cost ~ a couple of probes, no shuffle of the store beyond
    the doc-keyed dl check."""
    post = spark.table(table)
    stats = spark.table(table + "_stats")
    multi_gen = "gen" in stats.columns and stats.count() > 1

    per_doc = post.groupBy("doc_id").agg(
        F.sum("tf").alias("_tfsum"),
        F.min("dl").alias("_dlmin"),
        F.max("dl").alias("_dlmax"),
    )
    bad_dl = per_doc.where(
        (F.col("_dlmin") != F.col("_dlmax"))
        | (F.col("_tfsum") != F.col("_dlmin"))
    ).count()

    derived = post.groupBy("doc_id").agg(F.min("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("dl_total")
    ).first()
    if "gen" in stats.columns:
        summed = stats.agg(
            F.sum("n_docs").alias("n"), F.sum("dl_total").alias("t")
        ).first()
        bad_avgdl = stats.where(
            F.expr("avgdl_x100 != (100 * dl_total) div n_docs")
        ).count()
        bad_stats_dl = int(summed["t"] != derived["dl_total"])
    else:  # legacy single-row layout: dl_total was never persisted
        summed = stats.agg(F.sum("n_docs").alias("n")).first()
        bad_avgdl = 0
        bad_stats_dl = 0
    bad_stats_docs = int(summed["n"] != derived["n_docs"])

    if multi_gen:
        bad_df = 0
    else:
        bad_df = (
            post.groupBy("w")
            .agg(F.count("*").alias("_n"), F.min("df").alias("_dmin"),
                 F.max("df").alias("_dmax"))
            .where((F.col("_dmin") != F.col("_dmax"))
                   | (F.col("_n") != F.col("_dmin")))
            .count()
        )

    fwd_mismatch = 0
    if spark.catalog.tableExists(table + "_fwd"):
        fwd = spark.table(table + "_fwd")
        fwd_mismatch = (
            post.exceptAll(fwd).count() + fwd.exceptAll(post).count()
        )

    out = {
        "bad_dl": bad_dl,
        "bad_stats_docs": bad_stats_docs,
        "bad_stats_dl": bad_stats_dl,
        "bad_avgdl": bad_avgdl,
        "bad_df": bad_df,
        "fwd_mismatch": fwd_mismatch,
        "df_recompute_required": multi_gen,
        "n_generations": stats.count() if "gen" in stats.columns else 1,
    }
    out["ok"] = not any(
        v for k, v in out.items()
        if k.startswith(("bad_", "fwd_"))
    )
    return out
