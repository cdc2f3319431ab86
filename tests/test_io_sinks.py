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
