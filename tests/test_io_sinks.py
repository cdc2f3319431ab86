"""Partitioned sink semantics: dynamic partition overwrite must touch only
the partitions being reprocessed (io.write_partitioned_overwrite)."""

from pyspark.sql import functions as F

from albedo_spark.io import write_partitioned_overwrite


def _day_df(spark, rows):
    return spark.createDataFrame(rows, "day string, k long, v double")


def test_partition_overwrite_is_surgical(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _day_df(
        spark,
        [("2024-01-01", 1, 1.0), ("2024-01-02", 2, 2.0), ("2024-01-03", 3, 3.0)],
    )
    write_partitioned_overwrite(base, path, ["day"])

    # reprocess ONE day with different contents
    fix = _day_df(spark, [("2024-01-02", 99, 9.9)])
    write_partitioned_overwrite(fix, path, ["day"])

    got = {
        (str(r.day), r.k, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1, 1.0),
        ("2024-01-02", 99, 9.9),   # replaced
        ("2024-01-03", 3, 3.0),    # untouched
    }
    # conf restored for the session
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )


def test_partition_overwrite_idempotent(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = _day_df(spark, [("2024-02-01", 1, 1.0), ("2024-02-02", 2, 2.0)])
    write_partitioned_overwrite(df, path, ["day"])
    write_partitioned_overwrite(df, path, ["day"])  # rerun converges
    out = spark.read.parquet(path)
    assert out.count() == 2
    assert out.select(F.countDistinct("day")).collect()[0][0] == 2


def test_jsonl_ingest_with_corrupt_accounting(spark, tmp_path):
    from albedo_spark.io import read_jsonl_documents

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
        'this line is not json at all\n'
        '{"doc_id": 2, "text": "zwei", "lang": "de", "source": "web"}\n'
        '{"doc_id": 3, "text": "three"}\n'          # missing fields -> nulls, OK
        '{"doc_id": "not_a_number", "text": "bad type"}\n'
    )
    good, bad = read_jsonl_documents(spark, str(p))
    g = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    assert g == {1: ("hello world", "en"), 2: ("zwei", "de"), 3: ("three", None)}
    raws = [r.raw_line for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert any("not_a_number" in r for r in raws)


def test_jsonl_round_trip(spark, tmp_path):
    """write_jsonl -> read_jsonl_documents round-trips values exactly,
    honors the num_files cap, gzips by default, and refuses to export a
    _corrupt_record column."""
    import pytest as _pt

    from albedo_spark.io import read_jsonl_documents, write_jsonl

    rows = [
        (1, "hello world", "en", "web"),
        (2, "zwei drei", "de", "books"),
        (3, None, "fr", "web"),          # NULL text survives the trip
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = str(tmp_path / "drop")
    write_jsonl(df, out, num_files=1)
    import glob

    files = glob.glob(out + "/*.json.gz")
    assert len(files) == 1  # coalesced + gzip extension
    good, bad = read_jsonl_documents(spark, out)
    assert bad.count() == 0
    got = {r.doc_id: (r.text, r.lang, r.source) for r in good.collect()}
    assert got == {i: tuple(t) for i, *t in rows}

    poisoned = df.withColumn("_corrupt_record", F.lit("x"))
    with _pt.raises(ValueError):
        write_jsonl(poisoned, str(tmp_path / "nope"))


def test_compact_table_store_lifecycle(spark):
    """build -> append x3 -> compact: files collapse back to ~one per
    bucket, data survives exactly, and the bucketed-join layout property
    still holds post-compaction."""
    from albedo_spark.io import compact_table
    from albedo_spark.operators.dedup_store import (
        append_digests,
        build_digest_store,
        exact_dedup_incremental,
    )
    from pyspark.sql import functions as F

    tbl = "t_compact_store"
    try:
        base = spark.createDataFrame(
            [(i, f"text number {i}") for i in range(20)],
            "doc_id long, text string",
        )
        build_digest_store(base, tbl, num_buckets=4)
        for k in range(3):
            batch = spark.createDataFrame(
                [(100 + 20 * k + i, f"novel {k} {i}") for i in range(10)],
                "doc_id long, text string",
            )
            res = exact_dedup_incremental(batch, tbl)
            append_digests(res, tbl, num_buckets=4)
        before_rows = {
            (r.digest, r.keeper_id) for r in spark.table(tbl).collect()
        }
        stats = compact_table(spark, tbl, "digest", num_buckets=4)
        assert stats["files_before"] > 4  # appends fragmented the store
        assert stats["files_after"] <= 4
        assert stats["rows"] == len(before_rows) == 50
        after_rows = {
            (r.digest, r.keeper_id) for r in spark.table(tbl).collect()
        }
        assert after_rows == before_rows
        # layout property survives: with broadcast off (a tiny probe
        # would otherwise broadcast and skip bucketing trivially), the
        # join still reads the bucket layout
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = spark.createDataFrame(
                [("x",)], "digest string"
            ).join(spark.table(tbl), "digest")
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan, plan
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            else:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_drop_orphan_location_mtime_guard(spark):
    """The live-concurrent-publisher guard: a warehouse directory written
    at/after the watermark is refused (it may be another session's
    just-published table), an older one is a genuine orphan and goes;
    an absent location reports cleared either way."""
    import os
    import time

    from albedo_spark.io import drop_orphan_table_location

    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh = wh.removeprefix("file:")
    d = os.path.join(wh, "t_orphan_guard")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-0.parquet"), "w") as f:
        f.write("x")
    now_ms = int(time.time() * 1000)
    try:
        # dir mtime is "now": younger than a watermark 60 s in the past
        assert drop_orphan_table_location(
            spark, "t_orphan_guard", older_than_ms=now_ms - 60_000
        ) is False
        assert os.path.isdir(d)
        # age the directory past the watermark -> genuine orphan, deleted
        old = time.time() - 3600
        os.utime(d, (old, old))
        assert drop_orphan_table_location(
            spark, "t_orphan_guard", older_than_ms=now_ms
        ) is True
        assert not os.path.exists(d)
        # absent location: cleared, nothing to do
        assert drop_orphan_table_location(
            spark, "t_orphan_guard", older_than_ms=now_ms
        ) is True
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_compact_table_adopts_orphan_after_crashed_swap(spark):
    """A crash between compact_table's DROP and RENAME strands the
    compacted data in the pid-suffixed private table with the published
    name gone. The next compact_table call must ADOPT it back into place
    (no data loss), and a stale private copy alongside a LIVE published
    table must be dropped as debris."""
    from albedo_spark.io import compact_table, write_bucketed
    from albedo_spark.operators.dedup_store import build_digest_store

    tbl = "t_crash_store"
    try:
        base = spark.createDataFrame(
            [(i, f"text number {i}") for i in range(20)],
            "doc_id long, text string",
        )
        build_digest_store(base, tbl, num_buckets=4)
        rows = {(r.digest, r.keeper_id) for r in spark.table(tbl).collect()}

        # Simulate the crash window: the private compacted copy exists,
        # the published name was DROPped, the RENAME never ran.
        write_bucketed(spark.table(tbl), f"{tbl}__c999", "digest", 4)
        spark.sql(f"DROP TABLE `{tbl}`")
        assert not spark.catalog.tableExists(tbl)

        stats = compact_table(spark, tbl, "digest", num_buckets=4)
        assert stats["adopted"] == f"{tbl}__c999"
        after = {(r.digest, r.keeper_id) for r in spark.table(tbl).collect()}
        assert after == rows
        assert not spark.catalog.tableExists(f"{tbl}__c999")

        # Stale private copy while the published table is alive: debris.
        write_bucketed(spark.table(tbl), f"{tbl}__c123", "digest", 4)
        stats2 = compact_table(spark, tbl, "digest", num_buckets=4)
        assert stats2["adopted"] is None
        assert not spark.catalog.tableExists(f"{tbl}__c123")
        assert {
            (r.digest, r.keeper_id) for r in spark.table(tbl).collect()
        } == rows
    finally:
        for t in (tbl, f"{tbl}__c999", f"{tbl}__c123"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
