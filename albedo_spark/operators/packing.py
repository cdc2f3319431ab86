"""Sequence packing for LLM pre-training (no reference twin — §7.5-style
extension surface, same family as dedup/textstats).

Pre-training consumes documents as one concatenated token stream chopped
into fixed-length training sequences ("concat-and-chunk" packing: docs may
straddle chunk boundaries). The operator that decides where every document
lands is a GLOBAL exclusive prefix sum of token counts over a total
document order — the one primitive Spark's Window cannot do at scale
(``Window.orderBy`` with no partition key collapses the whole table onto a
single task).

``global_cumsum`` is the textbook two-phase distributed scan instead:

1. bucket rows by VALUE against approximate-quantile boundaries folded
   into the plan as literals (a pure projection — never
   ``spark_partition_id``, which is physical placement and changes
   between jobs),
2. per-bucket running sum (Window partitioned by the bucket id —
   parallel, no global collapse),
3. per-bucket TOTALS — one number per bucket — come to the driver, their
   running sum becomes each bucket's offset (a few thousand longs at
   cluster scale, never row data),
4. offsets join back as a literal map lookup: a pure projection.

Cost: one boundary-estimation aggregate plus one hash exchange of the
row data (the bucket window). Quantile approximation skews only bucket
BALANCE, never correctness — the offsets are computed from the buckets
actually produced, and because the bucket id is a function of the row
value, every job that recomputes the plan reproduces identical buckets
(no localCheckpoint/persist needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` over ``order_col`` order.

    ``order_col`` must be unique (a document/row id): uniqueness makes the
    total order — and therefore the result — deterministic regardless of
    partitioning. It must also be NUMERIC (quantile boundary estimation;
    hash string ids to a long first). ``exclusive=True`` gives the sum of
    all STRICTLY earlier rows (0 for the first), the form packing needs.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The bucket id must be a PURE FUNCTION OF THE ROW VALUE, never of
    # physical placement: repartitionByRange + spark_partition_id looks
    # natural but samples its boundaries independently per job, so the
    # offsets collected below would describe a different partitioning
    # than the one the caller's action recomputes (bit-exact at toy
    # sizes where the sample sees every row, silently wrong from ~10^6
    # rows — caught by a 50M-row scale check). Instead: approximate
    # quantile boundaries are collected ONCE and folded into the plan as
    # literals — approximation only skews bucket balance, never
    # correctness, and every job sees the same buckets with zero
    # materialization.
    probs = [i / n for i in range(1, n)]
    raw = df.agg(
        F.percentile_approx(order_col, probs, 10_000).alias("b")
    ).collect()[0]["b"]
    bounds = sorted(set(raw or []))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(
            F.filter(barr, lambda b: b <= F.col(order_col))
        ).cast("int")
    else:  # empty input or single value
        bucket = F.lit(0)
    ranged = df.withColumn("_pid", bucket)
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum(value_col).over(w))
    # One row per bucket reaches the driver — bounded by the bucket
    # count, never by data volume. Bucket ids ascend with key ranges, so
    # the running total in _pid order IS each bucket's offset. The total
    # is a plain per-bucket SUM (correct for any sign of value_col —
    # max(_local) would equal the bucket total only for non-negative
    # values).
    totals = (
        ranged.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    )
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = run
        run += r["_tot"] or 0
    if offsets:
        off_expr = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )[F.col("_pid")]
    else:  # empty input
        off_expr = F.lit(0)
    adj = F.col(value_col) if exclusive else F.lit(0)
    return (
        local.withColumn(out_col, F.col("_local") + off_expr - adj)
        .drop("_pid", "_local")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tok",
) -> DataFrame:
    """Concat-and-chunk packing plan: map every document to its span of
    fixed-``capacity`` training chunks.

    Documents are laid out contiguously in ``id_col`` order; a document
    occupying token offsets ``[start, start + n_tok)`` lands in chunks
    ``start // capacity`` .. ``(start + n_tok - 1) // capacity``
    (straddling documents span several — the standard GPT-style packing
    that wastes zero tokens on padding). Zero-token documents are dropped
    (they occupy no chunk).

    Output per doc: ``(id, n_tok, start_offset, first_chunk, last_chunk,
    n_chunks)`` — the full shard map a downstream tokenizer/writer needs
    to emit chunk files independently per partition.
    """
    nonempty = docs.where(F.col(tokens_col) > 0)
    laid = global_cumsum(
        nonempty, id_col, tokens_col, out_col="start_offset", exclusive=True
    )
    # `div` (integer division), not `/`: double division + cast is exact
    # only while offsets stay far below 2^53 — a 100 TB token stream does
    # not honor that forever.
    first = F.expr(f"start_offset div {capacity}")
    last = F.expr(f"(start_offset + `{tokens_col}` - 1) div {capacity}")
    return laid.select(
        id_col,
        tokens_col,
        F.col("start_offset").cast("long").alias("start_offset"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG/embedding-ingest twin of
    ``pack_sequences``): split each document into chunks of ``chunk_size``
    tokens advancing by ``chunk_size - overlap``, so consecutive chunks
    share ``overlap`` tokens and no boundary sentence is lost to a hard
    cut. The last chunk is the first window covering the document's end
    (no degenerate tail fully contained in its predecessor).

    Pure higher-order array expressions — sequence → transform → explode,
    shuffle-free, embarrassingly parallel per document; chunk counts are
    integer arithmetic (no float ceil). Output: (id, chunk_id, n_chunks,
    chunk_text, chunk_tokens).
    """
    from albedo_spark.operators.textstats import tokens

    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    # K = max(0, ceil((n - chunk_size) / stride)) via integer arithmetic
    k_max = F.greatest(
        F.lit(0).cast("long"),
        F.expr(f"(size - {chunk_size} + {stride} - 1) div {stride}"),
    )
    chunked = (
        docs.select(
            F.col(id_col), toks.alias("_toks"), n.alias("size")
        )
        .where(F.col("size") > 0)
        .select(
            id_col,
            "size",
            k_max.alias("_k_max"),
            F.explode(F.sequence(F.lit(0).cast("long"), k_max)).alias("chunk_id"),
            "_toks",
        )
    )
    piece = F.slice(
        F.col("_toks"), (F.col("chunk_id") * stride + 1).cast("int"), chunk_size
    )
    return chunked.select(
        id_col,
        "chunk_id",
        (F.col("_k_max") + 1).alias("n_chunks"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("chunk_tokens"),
    )


def content_defined_chunks(
    docs: DataFrame,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync idea at token
    granularity): a chunk boundary opens BEFORE token i (i > 0) whenever
    the token's content hash ≡ 0 (mod ``divisor``), giving chunks of
    ~``divisor`` tokens on average whose boundaries depend on CONTENT,
    not position — so inserting a paragraph shifts only the chunks it
    touches and every later chunk keeps its exact text and digest. That
    is what makes chunk-level dedup survive edits; ``chunk_documents``'s
    fixed windows re-cut the whole document after any insertion.

    Boundary hash is the md5-prefix integer (the q31 engine-portable
    draw), so the oracle replays identical boundaries. Plan shape: ZERO
    shuffles — boundary positions, chunk spans and chunk slices are all
    higher-order array expressions (filter/sequence → zip_with → slice)
    followed by one posexplode; embarrassingly parallel per document at
    any scale. Output: (id, chunk_id, n_tokens, chunk_text).

    The token array, boundary list and span lists are materialized
    behind PROJECTION BOUNDARIES (multi-referenced, so CollapseProject
    leaves them alone) before any lambda captures them — an inlined
    ``tokens(text)`` inside ``filter``/``zip_with`` re-runs the
    normalize+split regex once per ELEMENT (the ``shingles_from_words``
    re-evaluation pitfall; measured 13.2 s → 0.7 s at sf0.1).
    """
    from albedo_spark.operators.textstats import tokens

    hash_ok = (
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
        % divisor
        == 0
    )
    with_toks = (
        docs.where(F.col(text_col).isNotNull())
        .where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    )
    toks = F.col("_toks")
    n = F.size(toks)
    with_bounds = with_toks.select(
        id_col,
        "_toks",
        F.when(
            n >= 2,
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: hash_ok(F.element_at(toks, i + 1)),
            ),
        )
        .otherwise(F.array().cast("array<int>"))
        .alias("_bpos"),
    )
    starts = F.concat(F.array(F.lit(0)), F.col("_bpos"))
    ends = F.concat(F.col("_bpos"), F.array(n))
    chunks = F.zip_with(starts, ends, lambda s, e: F.slice(toks, s + 1, e - s))
    return with_bounds.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_c")
    ).select(
        id_col,
        "chunk_id",
        F.size("_c").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("_c")).alias("chunk_text"),
    )


def text_tiling_boundaries(
    docs: DataFrame,
    block_tokens: int = 16,
    threshold_x10k: int = 3000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TextTiling-style topic-boundary detection (Hearst 1997, the block
    comparison form): split each document into fixed ``block_tokens``
    blocks, score every ADJACENT block pair by distinct-token Jaccard
    (×10⁴ integer), and flag a semantic boundary where the similarity
    dips below ``threshold_x10k`` — the SEMANTIC chunking complement to
    ``chunk_documents`` (positional) and ``content_defined_chunks``
    (content-hash): boundaries land where the vocabulary actually
    shifts, which is where a RAG chunk should end.

    Output: one row per adjacent pair ``(id, pair_idx, sim_x10k,
    is_boundary)`` — pair_idx i scores blocks i and i+1, so a boundary
    at i means "cut before block i+1". Docs shorter than two blocks
    yield no rows (nothing to segment).

    Plan: ZERO shuffles — token array, block array (distinct tokens per
    block) and pair scores are each materialized behind a projection
    boundary (the q132 lambda-capture discipline) and the pair scoring
    is one ``transform`` over the block array + a posexplode. Integer
    Jaccard end-to-end; the oracle replays block slicing and
    intersection exactly.
    """
    from albedo_spark.operators.textstats import tokens

    w = block_tokens
    with_toks = (
        docs.where(F.col(text_col).isNotNull())
        .where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .where(F.size("_toks") >= 2 * w)
    )
    n_blocks = F.expr(f"size(_toks) div {w}")
    with_blocks = with_toks.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_distinct(F.slice(F.col("_toks"), i * w + 1, w)),
        ).alias("_blocks"),
    )
    # one int division per pair, floored after — a single identically-
    # rounded IEEE op in every engine (inputs are exact ints)
    sims = F.transform(
        F.sequence(F.lit(0), F.size("_blocks") - 2),
        lambda i: (
            F.size(
                F.array_intersect(
                    F.element_at(F.col("_blocks"), i + 1),
                    F.element_at(F.col("_blocks"), i + 2),
                )
            )
            * 10000
        )
        / F.size(
            F.array_union(
                F.element_at(F.col("_blocks"), i + 1),
                F.element_at(F.col("_blocks"), i + 2),
            )
        ),
    )
    return (
        with_blocks.select(F.col(id_col), F.posexplode(sims).alias("pair_idx", "_s"))
        .select(
            id_col,
            "pair_idx",
            F.floor("_s").cast("long").alias("sim_x10k"),
            (F.floor("_s") < threshold_x10k).alias("is_boundary"),
        )
    )
