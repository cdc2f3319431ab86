"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (north-star extension; not in the reference).

Design for 100 TB media:
- media rides as a ``binary`` column next to a metadata struct; Spark never
  interprets it until a mapInPandas stage does,
- decode / feature-extract run as **mapInPandas** over Arrow batches — one
  Python worker per partition, zero-copy binary in, columnar out,
- partition count should target ~128-512 MB of media per partition
  (``repartition`` upstream); decode is CPU-bound so pair with
  ``spark.task.cpus`` if codecs are multithreaded.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
pixel-level work is stubbed: with ``fake=True`` (default) a deterministic
content-hash fake produces stable, testable outputs through the REAL Spark
plumbing (schemas, Arrow batches, partitioning); ``fake=False`` raises
``NotImplementedError`` unless PIL is importable. The stub boundary is the
single ``_decode_bytes`` / ``_embed_bytes`` function per operator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),          # image | audio | video
    StructField("content", BinaryType(), True),
    StructField("format", StringType(), True),          # png/jpeg/wav/mp4/...
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", IntegerType(), True),
    StructField("digest", StringType(), True),
])

EMBED_DIM = 16
EMBED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def _require_real_codec():
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "Real media decoding needs PIL/ffmpeg, not present in this "
            "container. Use fake=True (deterministic stub) or install codecs."
        ) from exc


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for pixel decoding: dimensions derived from the
    content digest. STUB — ``_real_decode`` is the PIL-backed twin."""
    digest = hashlib.md5(content or b"").hexdigest()
    w = 16 + int(digest[:4], 16) % 2048
    h = 16 + int(digest[4:8], 16) % 2048
    return w, h, digest


def _real_decode(content: bytes) -> tuple[int, int, str]:
    """PIL-backed decode (only reachable after ``_require_real_codec``):
    true pixel dimensions, same (w, h, digest) contract as the fake."""
    import io as _io

    import PIL.Image

    with PIL.Image.open(_io.BytesIO(content)) as img:
        w, h = img.size
    return w, h, hashlib.md5(content or b"").hexdigest()


def decode_images(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary → (width, height, n_bytes, digest) via mapInPandas.

    ``fake=False`` is a REAL path where PIL is installed (true pixel dims),
    raising ``NotImplementedError`` only when it isn't — the swap-in is the
    per-row decoder alone; schema/batching/partitioning are identical."""
    if not fake:
        _require_real_codec()
    decode = _fake_decode if fake else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, digest = decode(content)
                out.append((mid, w, h, len(content or b""), digest))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_bytes", "digest"]
            )

    return media.select("media_id", "content").mapInPandas(run, DECODED_SCHEMA)


def extract_embeddings(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary → float embedding (EMBED_DIM) via mapInPandas. The fake embeds
    the md5 digest bytes scaled to [0,1) — deterministic and
    distance-meaningful for plumbing tests."""
    if not fake:
        _require_real_codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = hashlib.md5(content or b"").digest()
                vec = [b / 255.0 for b in d[:EMBED_DIM]]
                out.append((mid, vec))
            yield pd.DataFrame(out, columns=["media_id", "embedding"])

    return media.select("media_id", "content").mapInPandas(run, EMBED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("content", BinaryType(), True),
])


def resize_images(
    media: DataFrame, max_side: int = 256, fake: bool = True
) -> DataFrame:
    """binary → resized binary bounded by ``max_side`` (aspect preserved).
    The fake computes the target dims from the fake-decoded dims and
    truncates the byte stream proportionally to the area ratio;
    ``fake=False`` is a REAL PIL ``thumbnail`` re-encode where PIL is
    installed. Schema, batch shape, and size-reduction behavior are
    identical either way."""
    if not fake:
        _require_real_codec()

    def _fake_resize(content: bytes) -> tuple[int, int, bytes]:
        w, h, _ = _fake_decode(content)
        scale = min(max_side / max(w, h), 1.0)
        nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
        blob = content or b""
        keep = max(int(len(blob) * (nw * nh) / max(w * h, 1)), 1)
        return nw, nh, blob[:keep]

    def _real_resize(content: bytes) -> tuple[int, int, bytes]:
        import io as _io

        import PIL.Image

        with PIL.Image.open(_io.BytesIO(content)) as img:
            img.thumbnail((max_side, max_side))
            buf = _io.BytesIO()
            img.save(buf, format=img.format or "PNG")
            return img.size[0], img.size[1], buf.getvalue()

    resize = _fake_resize if fake else _real_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                nw, nh, blob = resize(content)
                out.append((mid, nw, nh, blob))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "content"])

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """video binary → n evenly-spaced 'frames'. The fake slices the byte
    stream; a real implementation seeks keyframes via ffmpeg — same
    row-explosion shape either way (1 row in → n rows out)."""
    if not fake:
        _require_real_codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = content or b""
                step = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    out.append((mid, i, blob[i * step:(i + 1) * step]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


AHASH_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("bands", ArrayType(IntegerType()), True),
])


def _grid_pixels(content: bytes, cells: int = 64) -> list[int]:
    """Locality-preserving stub 'decode' to a fixed grid: cell k samples
    byte ``(k·L) div cells`` — similar byte streams give similar grids
    (unlike an avalanche digest), which is what a PERCEPTUAL hash needs.
    STUB: the real path resizes to an 8×8 grayscale via PIL; the grid →
    hash math below is the real aHash algorithm either way."""
    n = len(content or b"")
    if n == 0:
        return [0] * cells
    return [content[(k * n) // cells] for k in range(cells)]


def ahash_images(media: DataFrame, fake: bool = True, cells: int = 64) -> DataFrame:
    """binary → average-hash (aHash) as four 16-bit bands via mapInPandas.

    The REAL perceptual-hash recipe: reduce the image to a tiny grid
    (8×8 grayscale; here the stride-sampled byte grid when ``fake``),
    take the integer mean, emit bit k = pixel_k > mean, packed
    big-endian into 4 × 16-bit bands. All-integer (floor mean, strict
    >), so DuckDB replays every band bit-for-bit from the same bytes.
    Bands, not one 64-bit word, so downstream hamming math never touches
    the sign bit and the LSH-style band join needs no bit surgery."""
    if not fake:
        _require_real_codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _grid_pixels(content, cells)
                mean = sum(px) // cells
                bits = [1 if p > mean else 0 for p in px]
                bands = [
                    sum(bits[16 * j + i] << (15 - i) for i in range(16))
                    for j in range(cells // 16)
                ]
                out.append((mid, bands))
            yield pd.DataFrame(out, columns=["media_id", "bands"])

    return media.select("media_id", "content").mapInPandas(run, AHASH_SCHEMA)


def ahash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate pairs: hamming(aHash_a, aHash_b) <=
    ``max_hamming`` → ``(id_a, id_b, hamming)`` — image-level dedup next
    to the text (MinHash/SimHash) and embedding (cosine) families.

    Plan: the banded LSH join — posexplode the 4 bands, equi-join on
    (band_idx, band_value) so only media sharing an IDENTICAL band ever
    pair (never |media|²), then verify with the exact hamming sum
    ``Σ bit_count(band_a XOR band_b)``. By pigeonhole the candidate set
    is COMPLETE for max_hamming <= 3 (4 bands, ≤3 differing bits → some
    band identical — same theorem as the SimHash band store q107);
    higher thresholds trade recall exactly like any banded LSH
    (documented). Everything after the pandas hash stage is JVM integer
    expressions."""
    # Lazy checkpoint (r16): h feeds FOUR consumers (both banded-join
    # sides + both verify array joins) — without the boundary the
    # upstream pandas hash stage (MapInPandas over the media bytes, the
    # expensive part) executes once PER consumer: the q147 plan carried
    # 4 MapInPandas nodes and 8 parquet scans. One materialized hash
    # pass instead (guide §4: never duplicate the Python boundary).
    h = hashes.select("media_id", "bands").localCheckpoint(eager=False)
    bands = h.select(
        "media_id", F.posexplode("bands").alias("band_idx", "band")
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .distinct()
    )
    ha = h.select(F.col("media_id").alias("id_a"), F.col("bands").alias("_ba"))
    hb = h.select(F.col("media_id").alias("id_b"), F.col("bands").alias("_bb"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with(
                    F.col("_ba"),
                    F.col("_bb"),
                    lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
