"""Incremental near-dup detection against a PERSISTED signature store.

The batch operators in ``dedup.py`` find duplicates *within* one frame.
A production pre-training pipeline instead dedups each new crawl batch
*against the historical corpus* — and at 100 TB the historical side must
be neither re-shingled nor re-shuffled per batch. This module closes that
loop (VERDICT r5 "What's missing #1"; no reference twin — §7.5 extension
surface):

- ``build_signature_store``: one-time (or per-backfill) pass that
  persists each document's banded MinHash keys as a BUCKETED table
  keyed on the band key (``io.write_bucketed``). The expensive work —
  normalize, shingle, ``num_hashes`` md5 min-scans — happens exactly
  once per document, ever.
- ``dedup_incremental``: candidate near-dup pairs of a new batch vs the
  store (plus within-batch pairs), where the store side is scanned
  bucket-aware with ZERO Exchange — only the (small) batch shuffles,
  into the store's own bucket layout. Pinned by
  tests/test_dedup.py::test_incremental_store_side_never_shuffles.
- ``append_signatures``: after the batch's pairs are consumed, its
  signatures join the store (bucketed append), so the next batch dedups
  against history *including* this one.

Band keys fold the band index INTO the key (``md5(band || '|' ||
h_i,…)``) so the store joins on ONE column — the bucket column — rather
than the (band, bkey) composite ``minhash_lsh_pairs`` uses internally;
the two schemes produce identical candidate pairs (a pair collides iff
some band's ``rows_per_band`` hashes all agree), which
tests/test_dedup.py::test_incremental_equals_self_join pins.

Bucket-size capping mirrors the self-join semantics on COMBINED size
(store count + batch count per key), so a key that was quiet historically
but explodes in the new batch is still suppressed. One inherent
asymmetry of incrementality: historical-internal pairs were emitted when
*their* batch arrived, under the bucket sizes of that time — a key that
later crosses ``max_bucket`` cannot retract them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.dedup import minhash_sig_table


def minhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded LSH key rows ``(id, bkey)`` — ``num_hashes/rows_per_band``
    rows per document, ``bkey = md5(band || '|' || minhashes joined ',')``
    (band index folded in: single join/bucket column, md5-portable so the
    DuckDB oracle replays it exactly)."""
    num_bands = num_hashes // rows_per_band
    sig = minhash_sig_table(df, text_col, id_col, num_hashes, shingle_n)
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.lit(f"{b}|"),
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"_h{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            ),
                        )
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bkey"),
    )


def build_signature_store(
    corpus: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    num_buckets: int = 16,
) -> None:
    """Persist the corpus's banded signatures as a bucketed table keyed on
    ``bkey``. Size ``num_buckets`` for the cluster (hundreds at 100 TB);
    every future ``dedup_incremental`` inherits this layout shuffle-free.
    """
    from albedo_spark.io import write_bucketed

    bands = minhash_band_rows(
        corpus, text_col, id_col, num_hashes, rows_per_band, shingle_n
    )
    write_bucketed(bands, table, "bkey", num_buckets=num_buckets)


def append_signatures(
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    num_buckets: int = 16,
) -> None:
    """Append the batch's signatures into the store (same bucket spec, so
    the layout property survives). Call AFTER the batch's
    ``dedup_incremental`` pairs are consumed: the store is re-listed at
    action time, so appending first would make the batch self-match
    through the store."""
    bands = minhash_band_rows(
        batch, text_col, id_col, num_hashes, rows_per_band, shingle_n
    )
    (
        bands.write.mode("append")
        .bucketBy(num_buckets, "bkey")
        .sortBy("bkey")
        .format("parquet")
        .saveAsTable(table)
    )


def dedup_incremental(
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    max_bucket: int = 200,
    exclude_store_ids: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a < id_b)`` touching the new batch:
    batch-vs-store plus batch-internal, under the combined bucket-size
    cap. Historical text is never re-read; the store side never shuffles
    (bucket-aware scan); the batch — the small side — shuffles once into
    the store's bucket layout. Verify survivors with
    ``dedup.jaccard_verify`` as usual (it only shingles documents that
    appear in a pair).

    ``exclude_store_ids`` (a one-column id frame, assumed small) drops
    those ids from the STORE side before the size cap and the joins — a
    broadcast anti-join, so the store still never shuffles. The
    streaming ingest sink passes the batch's own ids: on a replay whose
    previous attempt already appended the batch's signatures, the store
    then looks exactly as it did on the first attempt, so the admit set
    (including every combined-bucket-cap decision at the margin) is
    byte-identical — the exactly-once contract near ``max_bucket``.
    """
    spark = batch.sparkSession
    store = spark.table(table).select(
        F.col(id_col).alias("_sid"), "bkey"
    )
    if exclude_store_ids is not None:
        xid = exclude_store_ids.select(
            F.col(exclude_store_ids.columns[0]).alias("_xid")
        )
        store = store.join(
            F.broadcast(xid), F.col("_sid") == F.col("_xid"), "left_anti"
        )
    new_bands = minhash_band_rows(
        batch, text_col, id_col, num_hashes, rows_per_band, shingle_n
    ).select(F.col(id_col).alias("_bid"), "bkey")
    # Referenced three times below (sizes, cross, internal): materialize
    # the shingle/minhash stage once. Lazy localCheckpoint, NOT persist —
    # this function returns a lazy frame so it could never unpersist its
    # own cache, and a CacheManager entry would then accumulate per batch
    # in the production loop this operator exists for
    # (jobs/corpus.py --incremental-filter). Checkpoint blocks are
    # released by the ContextCleaner once the caller drops the batch's
    # result, so repeated batches stay flat (the line_boilerplate_dedup
    # discipline).
    new_bands = new_bands.localCheckpoint(eager=False)

    # Combined per-key size: the store-side count aggregates ON the
    # bucketed layout (partial+final hash agg, no Exchange — the
    # write_bucketed property), the batch side is small.
    store_sizes = store.groupBy("bkey").agg(F.count("*").alias("_ns"))
    batch_sizes = new_bands.groupBy("bkey").agg(F.count("*").alias("_nb"))
    eligible = (
        store_sizes.join(batch_sizes, "bkey", "full_outer")
        .where(
            F.coalesce("_ns", F.lit(0)) + F.coalesce("_nb", F.lit(0))
            <= max_bucket
        )
        .select("bkey")
    )

    cross = (
        new_bands.join(eligible, "bkey")
        .join(store, "bkey")
        .where(F.col("_bid") != F.col("_sid"))
        .select(
            F.least("_bid", "_sid").alias("id_a"),
            F.greatest("_bid", "_sid").alias("id_b"),
        )
    )
    a = new_bands.join(eligible, "bkey").alias("a")
    b = new_bands.alias("b")
    internal = a.join(
        b,
        (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a._bid") < F.col("b._bid")),
    ).select(F.col("a._bid").alias("id_a"), F.col("b._bid").alias("id_b"))
    return cross.unionByName(internal).distinct()


# ---------------------------------------------------------------------------
# Exact-digest store: the cheap first-pass twin of the MinHash store
# ---------------------------------------------------------------------------


def build_digest_store(
    corpus: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> None:
    """Persist one ``(digest, keeper_id)`` row per distinct normalized
    text, bucketed on the digest — the exact-dedup twin of the MinHash
    signature store. Run exact incremental dedup FIRST (it kills the bulk
    of duplication for one narrow join), MinHash incremental second."""
    from albedo_spark.io import write_bucketed
    from albedo_spark.operators.dedup import normalize_text

    d = (
        corpus.where(F.col(text_col).isNotNull())
        .select(
            F.md5(normalize_text(F.col(text_col))).alias("digest"),
            F.col(id_col),
        )
        .groupBy("digest")
        .agg(F.min(id_col).alias("keeper_id"))
    )
    write_bucketed(d, table, "digest", num_buckets=num_buckets)


def exact_dedup_incremental(
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve a new batch against the digest store WITHOUT rescanning the
    corpus: ``(id, digest, is_dup, keeper_id)``. A digest already in the
    store marks every batch row carrying it as a dup of the HISTORICAL
    keeper; otherwise the minimum batch id per digest is the novel keeper
    and its siblings dup against it. NULL-text rows pass through
    un-deduplicated (digest NULL, is_dup false — the ``exact_dedup``
    NULL precedent). The store side joins on its bucket column with no
    Exchange; only the batch shuffles.

    Feed the ``is_dup = false`` rows to ``append_digests`` after
    consuming the result, and the next batch dedups against history
    including this one.
    """
    from albedo_spark.operators.dedup import normalize_text

    spark = batch.sparkSession
    store = spark.table(table)
    hashed = batch.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("digest"),
    )
    batch_min = (
        hashed.where(F.col("digest").isNotNull())
        .groupBy("digest")
        .agg(F.min(id_col).alias("_bmin"))
    )
    j = hashed.join(store, "digest", "left").join(batch_min, "digest", "left")
    keeper = F.coalesce(F.col("keeper_id"), F.col("_bmin"))
    is_dup = F.col("digest").isNotNull() & (keeper != F.col(id_col))
    return j.select(
        F.col(id_col),
        "digest",
        is_dup.alias("is_dup"),
        F.when(is_dup, keeper).alias("keeper_id"),
    )


def append_digests(
    resolution: DataFrame,
    table: str,
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> None:
    """Append the NOVEL digests of a resolved batch (``is_dup = false``,
    non-NULL digest — i.e. each new digest's keeper) into the store."""
    (
        resolution.where(~F.col("is_dup") & F.col("digest").isNotNull())
        .select("digest", F.col(id_col).alias("keeper_id"))
        .write.mode("append")
        .bucketBy(num_buckets, "digest")
        .sortBy("digest")
        .format("parquet")
        .saveAsTable(table)
    )


# ---------------------------------------------------------------------------
# SimHash store: Hamming-granular near-dup, the fourth store granularity
# ---------------------------------------------------------------------------


def simhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 16,
    num_bands: int = 4,
) -> DataFrame:
    """(id, sim, bkey) band rows of the SimHash fingerprint: the
    ``num_bits``-bit hash splits into ``num_bands`` equal bit-slices and
    each slice becomes one md5 band key (band index folded in, the
    ``minhash_band_rows`` convention). Pigeonhole guarantee: two
    fingerprints within Hamming distance ``num_bands - 1`` share at
    least one unchanged slice, so banded candidate generation has FULL
    recall for ``max_hamming <= num_bands - 1`` — unlike MinHash, no
    probabilistic misses and no text re-read to verify (the stored
    fingerprints themselves decide via ``bit_count(xor)``)."""
    from albedo_spark.operators.dedup import simhash

    width = num_bits // num_bands
    mask = (1 << width) - 1
    # NULL-text docs carry no fingerprint: drop them here (the digest
    # store's isNotNull filter / the MinHash store's natural
    # shingle-explode drop) — otherwise concat_ws would skip the NULL
    # and every NULL doc would park four dead rows in the fixed
    # md5('0')..md5('3') buckets, inflating their size-cap counts.
    base = df.select(
        F.col(id_col), simhash(F.col(text_col), num_bits).alias("sim")
    ).where(F.col("sim").isNotNull())
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(b),
                    F.shiftright("sim", b * width)
                    .bitwiseAND(F.lit(mask))
                    .cast("string"),
                )
            )
            for b in range(num_bands)
        ]
    )
    return base.select(id_col, "sim", F.explode(keys).alias("bkey"))


def build_simhash_store(
    corpus: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 16,
    num_bands: int = 4,
    num_buckets: int = 16,
) -> None:
    """Persist the corpus's SimHash band rows bucketed on ``bkey`` — the
    Hamming-granularity member of the store family (digest = exact,
    MinHash = Jaccard, ANN = cosine, SimHash = Hamming)."""
    from albedo_spark.io import write_bucketed

    rows = simhash_band_rows(corpus, text_col, id_col, num_bits, num_bands)
    write_bucketed(rows, table, "bkey", num_buckets=num_buckets)


def append_simhash(
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 16,
    num_bands: int = 4,
    num_buckets: int = 16,
) -> None:
    """Append the batch's band rows (same bucket spec; call AFTER the
    batch's ``simhash_incremental`` pairs are consumed)."""
    rows = simhash_band_rows(batch, text_col, id_col, num_bits, num_bands)
    (
        rows.write.mode("append")
        .bucketBy(num_buckets, "bkey")
        .sortBy("bkey")
        .format("parquet")
        .saveAsTable(table)
    )


def simhash_incremental(
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 16,
    num_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 200,
    exclude_store_ids: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs ``(id_a < id_b, hamming)`` within Hamming distance
    ``max_hamming`` touching the new batch: batch-vs-store plus
    batch-internal, under the combined bucket-size cap. Same plan
    contract as ``dedup_incremental`` (store never shuffles, batch
    shuffles once into the store layout, bands lazily checkpointed), but
    the verification is EXACT and in-plan: ``bit_count(sim_a XOR
    sim_b)`` on the stored fingerprints — no candidate stage, no text
    re-read. Full recall iff ``max_hamming <= num_bands - 1``
    (pigeonhole); larger radii lose the guarantee."""
    spark = batch.sparkSession
    store = spark.table(table).select(
        F.col(id_col).alias("_sid"), F.col("sim").alias("_ssim"), "bkey"
    )
    if exclude_store_ids is not None:
        xid = exclude_store_ids.select(
            F.col(exclude_store_ids.columns[0]).alias("_xid")
        )
        store = store.join(
            F.broadcast(xid), F.col("_sid") == F.col("_xid"), "left_anti"
        )
    new_bands = (
        simhash_band_rows(batch, text_col, id_col, num_bits, num_bands)
        .select(
            F.col(id_col).alias("_bid"), F.col("sim").alias("_bsim"), "bkey"
        )
        .localCheckpoint(eager=False)
    )

    store_sizes = store.groupBy("bkey").agg(F.count("*").alias("_ns"))
    batch_sizes = new_bands.groupBy("bkey").agg(F.count("*").alias("_nb"))
    eligible = (
        store_sizes.join(batch_sizes, "bkey", "full_outer")
        .where(
            F.coalesce("_ns", F.lit(0)) + F.coalesce("_nb", F.lit(0))
            <= max_bucket
        )
        .select("bkey")
    )

    ham_cross = F.bit_count(
        F.col("_bsim").bitwiseXOR(F.col("_ssim"))
    ).cast("long")
    cross = (
        new_bands.join(eligible, "bkey")
        .join(store, "bkey")
        .where(
            (F.col("_bid") != F.col("_sid")) & (ham_cross <= max_hamming)
        )
        .select(
            F.least("_bid", "_sid").alias("id_a"),
            F.greatest("_bid", "_sid").alias("id_b"),
            ham_cross.alias("hamming"),
        )
    )
    a = new_bands.join(eligible, "bkey").alias("a")
    b = new_bands.alias("b")
    ham_int = F.bit_count(
        F.col("a._bsim").bitwiseXOR(F.col("b._bsim"))
    ).cast("long")
    internal = a.join(
        b,
        (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a._bid") < F.col("b._bid")),
    ).where(ham_int <= max_hamming).select(
        F.col("a._bid").alias("id_a"),
        F.col("b._bid").alias("id_b"),
        ham_int.alias("hamming"),
    )
    return cross.unionByName(internal).distinct()
