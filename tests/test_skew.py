"""Salting must be semantics-transparent: salted results == direct results."""

from pyspark.sql import functions as F

from albedo_spark.operators.skew import salted_aggregate, salted_join


def _skewed_df(spark):
    # key 1 holds 90% of rows (the hot key)
    rows = [(1, i % 7) for i in range(900)] + [(k, k) for k in range(2, 102)]
    return spark.createDataFrame(rows, "k int, v int")


def test_salted_aggregate_equals_direct(spark):
    df = _skewed_df(spark)
    direct = {
        r.k: (r.n, r.s, r.mx)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mx)
        for r in salted_aggregate(
            df, ["k"], [("count", "v", "n"), ("sum", "v", "s"), ("max", "v", "mx")]
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_rejects_non_decomposable(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_aggregate(_skewed_df(spark), ["k"], [("avg", "v", "a")])


def test_salted_join_equals_plain_join(spark):
    df = _skewed_df(spark)
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(1, 102)], "k int, name string")
    plain = sorted((r.k, r.v, r.name) for r in df.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.name) for r in salted_join(df, dim, ["k"]).collect())
    assert salted == plain


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    # write_bucketed co-locates both sides; the join plan must not reshuffle.
    # Broadcast is disabled inside the test so the proof is non-vacuous: a
    # small table would otherwise broadcast-join (trivially exchange-free)
    # and the bucketing claim would never be exercised. With broadcast off,
    # the plan MUST be a SortMergeJoin whose two bucketed scans feed it
    # with NO Exchange — the 100 TB property write_bucketed sells.
    from albedo_spark.io import write_bucketed

    a = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("x", F.col("k") * 2)
    b = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("y", F.col("k") + 1)
    write_bucketed(a, "bkt_a", "k", num_buckets=8)
    write_bucketed(b, "bkt_b", "k", num_buckets=8)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan
        assert "SelectedBucketsCount" in plan  # both scans read bucket layout

        # Aggregation on the bucket key rides the same layout: partial+final
        # hash agg collapse onto the bucketed scan with no exchange.
        agg = spark.table("bkt_a").groupBy("k").agg(F.sum("x").alias("sx"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_key_skew_profile(spark):
    from albedo_spark.operators.skew import key_skew_profile

    rows = [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 3 + [(4,)] * 1 + [(5,)] * 1
    df = spark.createDataFrame(rows, "k long")
    got = {r.k: (r.n, r.share_x1m, r.skew_factor_x1m)
           for r in key_skew_profile(df, ["k"], top_n=3).collect()}
    assert set(got) == {1, 2, 3}            # top-3 heaviest only
    assert got[1] == (80, 800000, 4000000)  # 80% share, 4x mean (mean=20)
    assert got[2] == (15, 150000, 750000)
    # plan: heap top-n, no full sort
    plan = key_skew_profile(df, ["k"], top_n=3)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
