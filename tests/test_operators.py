"""top-k, sessions, sampling, similarity, textstats operator tests."""

import pytest
from pyspark.sql import functions as F

from albedo_spark.operators.sampling import deterministic_sample, stratified_split
from albedo_spark.operators.sessions import session_stats, sessionize
from albedo_spark.operators.similarity import cosine_knn, random_hyperplane_lsh_knn
from albedo_spark.operators.textstats import lang_id, quality_score, token_count
from albedo_spark.operators.topk import (
    global_top_k,
    top_k_lists_per_group,
    top_k_per_group,
)


def test_top_k_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 5.0), (1, 12, 3.0), (2, 13, 1.0)],
        "g int, item int, score double",
    )
    out = top_k_per_group(
        df, ["g"], [F.col("score").desc(), F.col("item").asc()], 2
    ).collect()
    g1 = sorted(r.item for r in out if r.g == 1)
    assert g1 == [10, 11]  # tie broken by item asc, k bound respected


def test_top_k_lists_ordered(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 3.0), (1, 12, 2.0)], "g int, item int, s double"
    )
    out = top_k_lists_per_group(
        df, "g", "item", [F.col("s").desc(), F.col("item").asc()], 2
    ).collect()
    assert out[0].items == [11, 12]  # ordered by score desc, not collection order


def test_global_top_k_plan(spark):
    df = spark.range(1000).withColumn("v", F.col("id") * 7 % 100)
    plan = global_top_k(df, [F.col("v").desc(), F.col("id").asc()], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full sort at scale


def test_sessionize(spark):
    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),  # > 30 min gap → new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = session_stats(df)
    got = {(r.user_id, r.session_seq): r.n_events for r in out.collect()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_stratified_split_complement(spark, starring_df):
    sample, complement = stratified_split(
        starring_df, "user_id", 0.5, ["user_id", "repo_id"], seed=42
    )
    total = starring_df.count()
    assert sample.count() + complement.count() == total
    assert sample.join(complement, ["user_id", "repo_id"], "inner").count() == 0


def test_deterministic_sample_stable(spark):
    df = spark.range(1000)
    a = {r.id for r in deterministic_sample(df, "id", 10).collect()}
    b = {r.id for r in deterministic_sample(df, "id", 10).collect()}
    assert a == b and 0 < len(a) < 1000


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.95, 0.05]), # close to 2
        (4, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_cosine_knn_exact(vecs):
    queries = vecs.where("vec_id in (0, 2)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_knn(vecs, queries, k=1)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert got == {(0, 1), (2, 3)}


def test_lsh_knn_recall(vecs):
    queries = vecs.where("vec_id in (0, 2)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = random_hyperplane_lsh_knn(vecs, queries, k=1, dim=3, num_planes=4)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    # multi-probe LSH on separable toy data should recover the exact answer
    assert got == {(0, 1), (2, 3)}


def test_textstats(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat and it is warm in the sun for now"),
         (2, ""), (3, "der hund ist nicht auf der matte und ist mit auf")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    ).collect()}
    assert out[1].lang == "en" and out[3].lang == "de"
    assert out[2].n == 0 and out[2].q == pytest.approx(0.3)
    assert 0.0 <= out[1].q <= 1.0
