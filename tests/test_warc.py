"""WARC ingestion (sources/warc.py): header-driven record parsing over
hand-built WARC/1.0 bytes — plain and per-record-gzipped (the Common
Crawl layout) — through the real binaryFile + mapInPandas plumbing,
then the text-document bridge into the corpus front door."""

import gzip

import pytest
from pyspark.sql import functions as F

from albedo_spark.sources.warc import (
    parse_warc_bytes,
    read_warc_records,
    warc_text_documents,
)


def _record(
    rtype: str,
    uri: str,
    payload: bytes,
    rid: str = "<urn:uuid:1>",
    extra: bytes = b"",
) -> bytes:
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {rtype}\r\n".encode()
        + f"WARC-Record-ID: {rid}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        + b"Content-Type: application/http; msgtype=response\r\n"
        + extra
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\n".encode()
        + f"Content-Type: {ctype}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
        + body
    )


BODY_A = b"<html><body>Hello crawl world</body></html>"
BODY_B = "café résumé".encode("utf-8")
# payload containing a FAKE record header: a delimiter-scanning parser
# would split here; the Content-Length-driven one must not
BODY_TRAP = b"literal\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"


def _warc_bytes() -> bytes:
    recs = [
        _record("warcinfo", "", b"software: test\r\n", rid="<urn:uuid:0>"),
        _record("response", "http://a.example.com/x",
                _http(BODY_A), rid="<urn:uuid:a>"),
        _record("request", "http://a.example.com/x",
                b"GET /x HTTP/1.1\r\n\r\n", rid="<urn:uuid:rq>"),
        _record("response", "http://b.example.com/y",
                _http(BODY_B, ctype="text/html; charset=utf-8"),
                rid="<urn:uuid:b>"),
        _record("response", "http://c.example.com/z",
                _http(BODY_TRAP), rid="<urn:uuid:c>"),
    ]
    return b"".join(recs)


def test_parse_warc_bytes_plain_and_gzipped():
    data = _warc_bytes()
    for blob in (
        data,
        # Common Crawl layout: one gzip member per record, concatenated
        b"".join(gzip.compress(r) for r in [data[: len(data) // 2]])
        + gzip.compress(data[len(data) // 2 :]),
    ):
        recs = parse_warc_bytes(blob)
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "request", "response", "response",
        ]
        by_id = {r["record_id"]: r for r in recs}
        a = by_id["<urn:uuid:a>"]
        assert a["target_uri"] == "http://a.example.com/x"
        assert a["http_status"] == 200
        assert a["http_content_type"] == "text/html"
        assert a["payload"] == BODY_A
        # the trap record's payload survives INTACT: Content-Length
        # parsing, never delimiter scanning
        assert by_id["<urn:uuid:c>"]["payload"] == BODY_TRAP
        # non-HTTP records keep their raw payload
        assert by_id["<urn:uuid:rq>"]["http_status"] is None


def test_parse_warc_truncated_tail_dropped():
    data = _warc_bytes()
    recs = parse_warc_bytes(data[: len(data) - 30])  # cut into last record
    assert len(recs) == 4  # partial tail dropped, never half-parsed
    assert recs[-1]["record_id"] == "<urn:uuid:b>"


def test_read_warc_records_and_text_documents(spark, tmp_path):
    (tmp_path / "part-0.warc").write_bytes(_warc_bytes())
    (tmp_path / "part-1.warc.gz").write_bytes(gzip.compress(_warc_bytes()))

    recs = read_warc_records(spark, str(tmp_path))  # default: responses only
    rows = recs.collect()
    assert len(rows) == 6  # 3 responses per file
    assert {r.warc_type for r in rows} == {"response"}
    assert all(r.warc_file for r in rows)

    docs = warc_text_documents(recs)
    got = {r.url: r.text for r in docs.collect()}
    assert got["http://a.example.com/x"] == BODY_A.decode()
    assert got["http://b.example.com/y"] == "café résumé"  # charset honored
    # deterministic ids: same record id -> same doc_id across both files
    ids = docs.groupBy("url").agg(F.countDistinct("doc_id").alias("n")).collect()
    assert all(r.n == 1 for r in ids)
    # plumbing: the parse stage is Arrow-batched, never row-Python
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    # keep everything when types=None
    all_recs = read_warc_records(spark, str(tmp_path), types=None)
    assert all_recs.count() == 10  # 5 records x 2 files


def test_warc_front_door_composition(spark, tmp_path):
    """WARC -> text documents -> URL hygiene + langid: the Common Crawl
    front door end to end on synthetic records."""
    from albedo_spark.operators.dedup import url_duplicate_groups
    from albedo_spark.operators.textstats import langid_chargram

    (tmp_path / "c.warc").write_bytes(_warc_bytes())
    docs = warc_text_documents(read_warc_records(spark, str(tmp_path)))
    grp = url_duplicate_groups(docs)
    assert grp.count() == 3  # three distinct canonical urls
    pred = langid_chargram(docs)
    assert {r.lang_pred for r in pred.collect()} <= {
        "en", "de", "es", "fr", "zh", "und",
    }


def test_warc_justext_extraction_composition(spark, tmp_path):
    """WARC -> decoded HTML -> jusText main-content extraction: the
    missing middle of the crawl front door. The page carries a
    link-dense nav, a real body paragraph and a copyright footer; only
    the body survives into main_text."""
    from albedo_spark.operators.extraction import html_main_text

    body = (
        "it was a bright cold day in april and the clocks were striking "
        "thirteen and he walked to the office with his hands in his "
        "pockets while the wind was at his back for most of an hour and "
        "he thought about all of the things they had said at the meeting"
    )
    page = (
        '<html><body><div class="nav"><a href="/">Home</a> '
        '<a href="/a">About us</a> <a href="/c">Contact</a></div>'
        f"<p>{body}</p>"
        "<div>&copy; Example Inc all rights reserved</div>"
        "</body></html>"
    ).encode()
    (tmp_path / "page.warc").write_bytes(
        _record("response", "http://ex.example.com/p", _http(page),
                rid="<urn:uuid:px>")
    )
    docs = warc_text_documents(read_warc_records(spark, str(tmp_path)))
    out = html_main_text(docs, html_col="text").collect()
    assert len(out) == 1
    assert out[0].main_text == body
    assert out[0].n_good_blocks == 1
