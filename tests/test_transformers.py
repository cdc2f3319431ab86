"""NegativeBalancer invariants (FIXTURES.md golden check #5) +
UserRepoTransformer + IntermediateCacher + persistence round-trips."""

import tempfile

import pytest
from pyspark.sql import functions as F

from albedo_spark.transformers import (
    IntermediateCacher,
    NegativeBalancer,
    UserRepoTransformer,
)
from albedo_spark.transformers.negative_balancer import SENTINEL_TIMESTAMP


@pytest.fixture()
def toy_starring(spark):
    rows = [
        (1, 10, "2017-01-01 00:00:00", 1.0),
        (1, 11, "2017-01-02 00:00:00", 1.0),
        (2, 10, "2017-01-03 00:00:00", 1.0),
        (3, 12, "2017-01-04 00:00:00", 1.0),
        # user 4 has starred every popular item
        (4, 10, "2017-01-05 00:00:00", 1.0),
        (4, 11, "2017-01-05 00:00:00", 1.0),
        (4, 12, "2017-01-05 00:00:00", 1.0),
        (4, 13, "2017-01-05 00:00:00", 1.0),
    ]
    return spark.createDataFrame(
        rows, "user_id int, repo_id int, starred_at string, starring double"
    ).withColumn("starred_at", F.col("starred_at").cast("timestamp"))


POPULAR = [10, 11, 12, 13]


def test_negative_balancer_invariants(toy_starring):
    nb = NegativeBalancer(popular_items=POPULAR, negativePositiveRatio=1.0)
    out = nb.transform(toy_starring).cache()
    pos = out.where("starring = 1.0")
    neg = out.where("starring = 0.0")
    assert pos.count() == toy_starring.count()
    # invariant: no emitted negative is a positive of the same user
    assert neg.join(toy_starring, ["user_id", "repo_id"], "inner").count() == 0
    # sentinel timestamp (NegativeBalancer.scala:107)
    stamps = {str(r.starred_at) for r in neg.select("starred_at").distinct().collect()}
    assert stamps == {"1999-07-01 00:00:00"}
    # user 1: 2 positives → 2 negatives (most popular unseen first: 12, 13)
    u1 = sorted(r.repo_id for r in neg.where("user_id = 1").collect())
    assert u1 == [12, 13]
    # user 4 starred all popular items → no negatives possible
    assert neg.where("user_id = 4").count() == 0


def test_negative_balancer_ratio_zero(toy_starring):
    nb = NegativeBalancer(popular_items=POPULAR, negativePositiveRatio=0.0)
    out = nb.transform(toy_starring)
    assert out.where("starring = 0.0").count() == 0


def test_user_repo_transformer(spark):
    df = spark.createDataFrame(
        [(1, "Python", ["python", "go"]), (2, "Nim", ["python"])],
        "id int, repo_language string, user_recent_repo_languages array<string>",
    )
    out = UserRepoTransformer().transform(df).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].repo_language_index_in_user_recent_repo_languages == 0
    assert by_id[2].repo_language_index_in_user_recent_repo_languages == 51
    assert by_id[1].repo_language_count_in_user_recent_repo_languages == 1


def test_intermediate_cacher(spark):
    df = spark.createDataFrame([(1, "a")], "id int, x string")
    out = IntermediateCacher(inputCols=["id"]).transform(df)
    assert out.columns == ["id"]
    assert out.is_cached


def test_params_persistence_roundtrip(spark, tmp_path):
    nb = NegativeBalancer(popular_items=POPULAR, negativePositiveRatio=2.0)
    path = str(tmp_path / "nb")
    nb.write().overwrite().save(path)
    loaded = NegativeBalancer.load(path)
    assert loaded.getOrDefault(loaded.negativePositiveRatio) == 2.0


def test_snowball_stemmer(spark):
    from albedo_spark.transformers import SnowballStemmer

    df = spark.createDataFrame(
        [(1, ["running", "flies", "relational", "spark"]), (2, None)],
        "id int, tokens array<string>",
    )
    out = {r.id: r.stemmed for r in SnowballStemmer().transform(df).collect()}
    assert out[1] == ["run", "fli", "relat", "spark"]
    assert out[2] is None


def test_func_transformer(spark):
    from pyspark.sql import functions as F

    from albedo_spark.transformers import FuncTransformer

    df = spark.createDataFrame([("Hello World",)], "input string")
    t = FuncTransformer(lambda c: F.lower(c), outputCol="lowered")
    row = t.transform(df).collect()[0]
    assert row.lowered == "hello world"
    # stays a native expression: no Python-UDF node in the plan
    plan = t.transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_als_cv_selects_over_grid(spark, starring_df):
    from albedo_spark.evaluators.ranking import user_actual_items
    from albedo_spark.pipelines.cv import als_cv, best_params_report

    actual = user_actual_items(starring_df, k=10).withColumnRenamed(
        "actual_items", "actual_items"
    )
    model = als_cv(
        starring_df,
        actual,
        grid={"rank": [4, 8], "maxIter": [2]},
        num_folds=2,
        k=10,
    )
    report = best_params_report(model)
    assert len(report) == 2  # one entry per grid point
    assert report[0][1] >= report[1][1]
    assert {"rank", "maxIter"} <= set(report[0][0].keys())


def test_pipeline_model_save_load_all_custom_stages(spark, tmp_path):
    """PipelineModel.save/load with EVERY custom stage in one pipeline
    (SURVEY §7.4: 'finicky param serialization; test early'; the reference
    memoizes whole fitted pipelines, S/utils/ModelUtils.scala:7-21).
    Asserts identical transform output pre/post load and that non-default
    params — including the two that were plain attributes before
    (RankingMetricFormatter.listCol, NegativeBalancer.popularItems) —
    survive the roundtrip."""
    import datetime as dt

    from pyspark.ml import Pipeline, PipelineModel

    from albedo_spark.transformers import (
        IntermediateCacher,
        NativeTokenizer,
        NegativeBalancer,
        RankingMetricFormatter,
        SnowballStemmer,
        UserRepoTransformer,
    )

    rows = [
        (u, r, dt.datetime(2017, 1, 1 + (u + r) % 20), 1.0,
         "python" if r % 2 else "scala",
         ["python", "go"] if u % 2 else ["scala"],
         f"running relational queries number {u * 10 + r}",
         float((u * 7 + r * 3) % 10))
        for u in range(1, 6)
        for r in range(1, 4 + u % 2)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, repo_id long, starred_at timestamp, starring double, "
        "repo_language string, user_recent_repo_languages array<string>, "
        "text string, prediction double",
    )

    stages = [
        NativeTokenizer(inputCol="text", outputCol="words"),
        SnowballStemmer(inputCol="words", outputCol="stemmed"),
        UserRepoTransformer(),
        IntermediateCacher(inputCols=[
            "user_id", "repo_id", "starred_at", "starring",
            "repo_language_index_in_user_recent_repo_languages",
        ]),
        NegativeBalancer(popular_items=POPULAR, negativePositiveRatio=1.0),
        RankingMetricFormatter(
            sourceType="als", predictionCol="starring", topK=3,
            listCol="top_items",
        ),
    ]
    model = Pipeline(stages=stages).fit(df)
    before = {(r.user_id, tuple(r.top_items)) for r in model.transform(df).collect()}
    assert before  # non-degenerate

    path = str(tmp_path / "full_pipeline")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)

    after = {(r.user_id, tuple(r.top_items)) for r in loaded.transform(df).collect()}
    assert after == before

    lst = loaded.stages
    assert lst[-1].getOrDefault(lst[-1].listCol) == "top_items"
    assert lst[-2].popular_items == list(POPULAR)
    assert lst[1].getOrDefault(lst[1].outputCol) == "stemmed"
    assert lst[3].getOrDefault(lst[3].inputCols)[0] == "user_id"
