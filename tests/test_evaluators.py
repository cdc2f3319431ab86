"""RankingEvaluator vs pyspark.mllib.evaluation.RankingMetrics — the
library we re-implemented in pure DataFrame expressions is its own oracle."""

import random

import pytest
from pyspark.mllib.evaluation import RankingMetrics

from albedo_spark.evaluators import RankingEvaluator, ranking_metrics_df
from albedo_spark.evaluators.ranking import user_actual_items


@pytest.fixture(scope="module")
def lists_df(spark):
    rng = random.Random(42)
    rows = []
    for uid in range(60):
        pred = rng.sample(range(1000), rng.randrange(1, 35))
        actual = rng.sample(range(1000), rng.randrange(0, 40))
        # overlap injection so metrics are non-trivial
        if actual and rng.random() < 0.8:
            for x in rng.sample(actual, max(1, len(actual) // 4)):
                if x not in pred:
                    pred[rng.randrange(len(pred))] = x
        rows.append((uid, pred, actual))
    return spark.createDataFrame(
        rows, "user_id int, pred_items array<int>, actual_items array<int>"
    ).cache()


@pytest.mark.parametrize("metric,k", [("ndcg@k", 5), ("ndcg@k", 30),
                                      ("precision@k", 5), ("map", 30)])
def test_matches_mllib(spark, lists_df, metric, k):
    ours = RankingEvaluator(metricName=metric, k=k).evaluate(lists_df)
    rdd = lists_df.rdd.map(lambda r: (r.pred_items, r.actual_items))
    m = RankingMetrics(rdd)
    theirs = (
        m.ndcgAt(k) if metric == "ndcg@k"
        else m.precisionAt(k) if metric == "precision@k"
        else m.meanAveragePrecision
    )
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_per_user_metrics_shape(lists_df):
    out = ranking_metrics_df(lists_df, k=10)
    row = out.where("size(actual_items) = 0").first()
    if row is not None:
        assert row["ndcg_at_10"] == 0.0 and row["avg_precision"] == 0.0


def test_user_actual_items(spark, starring_df):
    out = user_actual_items(starring_df, k=5)
    assert out.columns == ["user_id", "actual_items"]
    sizes = [r.n for r in out.selectExpr("size(actual_items) n").collect()]
    assert max(sizes) <= 5 and min(sizes) >= 1
