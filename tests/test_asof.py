"""as_of_join semantics: inclusive match, latest-prior selection, inner vs
left behavior."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "p1"),
         (1, "2024-01-01 12:00:00", "p2"),
         (2, "2024-01-01 09:00:00", "p3")],
        "user_id int, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 100),
         (1, "2024-01-01 10:00:00", 200),   # equal ts → inclusive match
         (1, "2024-01-01 11:00:00", 300),
         (3, "2024-01-01 08:00:00", 400)],
        "user_id int, ts string, v int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_asof_inner(spark, sides):
    from albedo_spark.operators.asof import as_of_join

    left, right = sides
    out = {r.tag: r.asof_v for r in as_of_join(
        left, right, key="user_id", value_cols=["v"]).collect()}
    assert out == {"p1": 200, "p2": 300}  # p3: user 2 has no rhs → dropped


def test_asof_left(spark, sides):
    from albedo_spark.operators.asof import as_of_join

    left, right = sides
    out = {r.tag: r.asof_v for r in as_of_join(
        left, right, key="user_id", value_cols=["v"], how="left").collect()}
    assert out["p3"] is None and len(out) == 3
