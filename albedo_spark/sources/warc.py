"""WARC ingestion: the crawl pipeline's REAL input format (north-star
extension; not in the reference). Common Crawl ships as WARC/1.0 and
WARC/1.1 files (ISO 28500 — a public format: each record is a header
block of ``Name: value`` lines ending in a blank line, a payload of
exactly ``Content-Length`` bytes, then ``\\r\\n\\r\\n``), usually as
``.warc.gz`` where every record is its own gzip member so files are
splittable per record in principle and trivially decompressible as a
whole (Python's gzip reads concatenated members natively).

Design for 100 TB of crawl:

- files load via Spark's ``binaryFile`` source — ONE task per WARC file
  (Common Crawl files are ~1 GB, the right task granularity; at higher
  file counts the source parallelizes across the fleet for free);
- record parsing runs as **mapInPandas** over Arrow batches: bytes in,
  columnar records out, nothing row-at-a-time on the JVM side;
- the parser is header-driven (``Content-Length`` exactly — never a
  delimiter scan, which payload bytes could spoof) and pure stdlib, so
  there is no codec to stub;
- HTTP ``response`` payloads are optionally split into status/headers/
  body right in the same pass (``http_parse=True``) — the body is what
  the text pipeline (markup strip → URL hygiene → langid → quality)
  consumes downstream.

``read_warc_records`` is the entry point; ``parse_warc_bytes`` is the
pure-Python core, unit-tested against hand-built WARC bytes (plain and
per-record-gzipped).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType([
    StructField("warc_file", StringType(), False),
    StructField("record_offset", LongType(), False),   # ordinal in file
    StructField("warc_type", StringType(), True),      # response/request/...
    StructField("record_id", StringType(), True),
    StructField("target_uri", StringType(), True),
    StructField("warc_date", StringType(), True),
    StructField("content_type", StringType(), True),
    StructField("content_length", LongType(), True),
    StructField("http_status", IntegerType(), True),   # http_parse only
    StructField("http_content_type", StringType(), True),
    StructField("payload", BinaryType(), True),
])


def _decompress_if_gzip(data: bytes) -> bytes:
    """Transparent gzip: Common Crawl WARCs are concatenated gzip members
    (one per record); Python's GzipFile reads members back-to-back."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            return fh.read()
    return data


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC/HTTP header block → dict (first line skipped by callers when
    it is a version/status line). Case-insensitive names, values
    trimmed; continuation lines (obsolete LWS folding) appended."""
    out: dict[str, str] = {}
    last = None
    for raw in block.split(b"\r\n"):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and last is not None:
            out[last] += " " + raw.strip().decode("latin-1")
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("latin-1").lower()
        out[last] = value.strip().decode("latin-1")
    return out


def parse_warc_bytes(
    data: bytes, http_parse: bool = True
) -> list[dict]:
    """Parse one WARC file's bytes into record dicts (WARC_SCHEMA minus
    warc_file). Header-driven: each record's payload is EXACTLY its
    ``Content-Length`` bytes — payload content can never be mistaken
    for a record boundary. Unknown/garbage trailing bytes end the
    parse cleanly (crawl files are sometimes truncated; a partial tail
    record is dropped, never half-parsed)."""
    data = _decompress_if_gzip(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    ordinal = 0
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            break  # trailing garbage / truncation
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        # the WARC/x.y version line carries no colon, so the header
        # parser skips it without special-casing
        headers = _parse_headers(data[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated tail record
        payload = data[body_start : body_start + clen]  # noqa: E203
        rec = {
            "record_offset": ordinal,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "http_status": None,
            "http_content_type": None,
            "payload": payload,
        }
        if (
            http_parse
            and rec["warc_type"] == "response"
            and payload[:5] == b"HTTP/"
        ):
            split = payload.find(b"\r\n\r\n")
            if split >= 0:
                status_line = payload[: payload.find(b"\r\n")]
                parts = status_line.split(b" ")
                try:
                    rec["http_status"] = int(parts[1])
                except (IndexError, ValueError):
                    pass
                hh = _parse_headers(payload[:split])
                rec["http_content_type"] = hh.get("content-type")
                rec["payload"] = payload[split + 4 :]  # noqa: E203
        records.append(rec)
        ordinal += 1
        pos = body_start + clen
    return records


def read_warc_records(
    spark: SparkSession,
    path: str,
    http_parse: bool = True,
    types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """WARC files under ``path`` → one row per record (WARC_SCHEMA).
    ``types`` pre-filters record types INSIDE the parse pass (Common
    Crawl files carry request/metadata records a text pipeline never
    wants — dropping them before Arrow serialization is free);
    ``None`` keeps everything. ``http_parse=True`` additionally splits
    HTTP response payloads into status / content-type / body.

    Plan: one ``binaryFile`` scan (a task per WARC file — size files,
    not this operator) feeding one mapInPandas stage; downstream text
    stages consume ``payload`` (the HTTP body when parsed) plus
    ``target_uri`` — exactly what the URL-hygiene front door keys on."""
    keep = set(types) if types is not None else None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), http_parse):
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse, WARC_SCHEMA)


def warc_text_documents(
    records: DataFrame,
    charset_default: str = "utf-8",
) -> DataFrame:
    """HTTP-response WARC records → ``(doc_id, url, text)`` document rows
    for the corpus front door: payload bytes decode as the declared
    charset (fallback ``charset_default``, errors replaced — crawl data
    lies about encodings), doc_id is a deterministic 63-bit hash of the
    record id so downstream keepers/caps are stable across re-parses.
    Chain: ``read_warc_records`` → this → ``functions.text.strip_markup``
    → URL hygiene (q175-q177) → langid (q174) → quality."""
    from pyspark.sql import functions as F

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for payload, ctype in zip(pdf["payload"], pdf["http_content_type"]):
                cs = charset_default
                if ctype and "charset=" in ctype:
                    cs = ctype.split("charset=", 1)[1].split(";")[0].strip()
                try:
                    texts.append(bytes(payload).decode(cs, errors="replace"))
                except LookupError:  # unknown charset label
                    texts.append(
                        bytes(payload).decode(charset_default, errors="replace")
                    )
            yield pd.DataFrame(
                {
                    "record_id": pdf["record_id"],
                    "url": pdf["target_uri"],
                    "text": texts,
                }
            )

    decoded = records.where(
        (F.col("warc_type") == "response") & F.col("payload").isNotNull()
    ).select("record_id", "target_uri", "payload", "http_content_type")
    out = decoded.mapInPandas(
        _decode, "record_id string, url string, text string"
    )
    return out.select(
        # md5-derived 60-bit id (the repo's portable-hash convention)
        F.conv(F.substring(F.md5("record_id"), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        "url",
        "text",
    )
