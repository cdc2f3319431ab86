"""RankingEvaluator (M6): NDCG@k / Precision@k / MAP over per-user
(predicted, actual) item lists.

Reference: ``S/evaluators/RankingEvaluator.scala:14-108`` drops to RDDs and
``mllib.evaluation.RankingMetrics`` (F14). This implementation is pure
DataFrame — per-user metrics are array higher-order expressions (no Python,
no RDD handoff), the final mean is a single agg; it reproduces
``RankingMetrics`` semantics exactly (binary relevance; users with empty
actuals score 0; tested against mllib in tests/test_evaluators.py):

- precision@k  = |hits in first k| / k
- ndcg@k       = Σ_{i<k, pred_i∈actual} 1/log2(i+2)  /  Σ_{i<min(|actual|,k)} 1/log2(i+2)
- map          = (Σ_{i: pred_i∈actual} |hits ≤ i| / (i+1)) / |actual|

At scale this is one narrow projection over |users| rows — the expensive
part (building the lists) is the caller's W1 window, not the metric.
"""

from __future__ import annotations

from pyspark.ml.evaluation import Evaluator
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _log2(x: Column) -> Column:
    return F.log(x.cast("double")) / F.log(F.lit(2.0))


def _dcg_at_k(pred: Column, actual: Column, k: int) -> Column:
    head = F.slice(pred, 1, k)
    terms = F.transform(
        head,
        lambda x, i: F.when(
            F.array_contains(actual, x), 1.0 / _log2(i.cast("double") + 2.0)
        ).otherwise(F.lit(0.0)),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)


def _idcg_at_k(actual: Column, k: int) -> Column:
    n = F.least(F.size(actual), F.lit(k))
    idx = F.sequence(F.lit(0), n - 1)
    return F.when(n > 0, F.aggregate(
        F.transform(idx, lambda i: 1.0 / _log2(i.cast("double") + 2.0)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )).otherwise(F.lit(0.0))


def ndcg_at_k(pred: Column, actual: Column, k: int) -> Column:
    idcg = _idcg_at_k(actual, k)
    return F.when(
        (F.size(actual) > 0) & (idcg > 0), _dcg_at_k(pred, actual, k) / idcg
    ).otherwise(F.lit(0.0))


def precision_at_k(pred: Column, actual: Column, k: int) -> Column:
    hits = F.size(F.array_intersect(F.slice(pred, 1, k), actual))
    return F.when(F.size(actual) > 0, hits.cast("double") / k).otherwise(F.lit(0.0))


def average_precision(pred: Column, actual: Column) -> Column:
    # hits-so-far at position i via intersect of the first i+1 predictions;
    # O(n²) per row but n is topK (≤ ~30) — still a single projection.
    terms = F.transform(
        pred,
        lambda x, i: F.when(
            F.array_contains(actual, x),
            F.size(F.array_intersect(F.slice(pred, 1, i + 1), actual)).cast("double")
            / (i.cast("double") + 1.0),
        ).otherwise(F.lit(0.0)),
    )
    ap_sum = F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(F.size(actual) > 0, ap_sum / F.size(actual)).otherwise(F.lit(0.0))


def ranking_metrics_df(
    dataset: DataFrame,
    pred_col: str = "pred_items",
    actual_col: str = "actual_items",
    k: int = 30,
) -> DataFrame:
    """Per-user metric columns — useful for debugging and as an
    oracle-checkable query surface."""
    p, a = F.col(pred_col), F.col(actual_col)
    return dataset.withColumns(
        {
            f"ndcg_at_{k}": ndcg_at_k(p, a, k),
            f"precision_at_{k}": precision_at_k(p, a, k),
            "avg_precision": average_precision(p, a),
        }
    )


def user_actual_items(
    starring_df: DataFrame,
    user_col: str = "user_id",
    item_col: str = "repo_id",
    time_col: str = "starred_at",
    k: int = 30,
    list_col: str = "actual_items",
) -> DataFrame:
    """Ground-truth per-user item lists: top-k most recent stars
    (``RankingEvaluator.intoUserActualItems``, RankingEvaluator.scala:121-129
    — over the FULL starring set, the reference's evaluation quirk,
    SURVEY.md §1.4 #3). row_number + id tiebreak for determinism."""
    from albedo_spark.operators.topk import top_k_lists_per_group

    return top_k_lists_per_group(
        starring_df,
        user_col,
        item_col,
        [F.col(time_col).desc(), F.col(item_col).desc()],
        k,
        list_col=list_col,
    )


class RankingEvaluator(
    Evaluator, DefaultParamsReadable, DefaultParamsWritable
):
    """``evaluate(df)`` where df has array columns of predicted and actual
    item ids per user. ``metricName`` ∈ {'ndcg@k', 'precision@k', 'map'};
    larger is better for all three (Scala twin returns k via param too,
    RankingEvaluator.scala:30-45)."""

    metricName = Param(
        Params._dummy(), "metricName", "ndcg@k | precision@k | map",
        TypeConverters.toString,
    )
    k = Param(Params._dummy(), "k", "cutoff", TypeConverters.toInt)
    predictionItemsCol = Param(
        Params._dummy(), "predictionItemsCol", "predicted items array column",
        TypeConverters.toString,
    )
    labelItemsCol = Param(
        Params._dummy(), "labelItemsCol", "actual items array column",
        TypeConverters.toString,
    )

    def __init__(
        self,
        metricName: str = "ndcg@k",
        k: int = 30,
        predictionItemsCol: str = "pred_items",
        labelItemsCol: str = "actual_items",
    ):
        super().__init__()
        self._setDefault(
            metricName="ndcg@k", k=30,
            predictionItemsCol="pred_items", labelItemsCol="actual_items",
        )
        self._set(
            metricName=metricName, k=k,
            predictionItemsCol=predictionItemsCol, labelItemsCol=labelItemsCol,
        )

    def getK(self) -> int:
        return self.getOrDefault(self.k)

    def getMetricName(self) -> str:
        return self.getOrDefault(self.metricName)

    def _evaluate(self, dataset: DataFrame) -> float:
        p = F.col(self.getOrDefault(self.predictionItemsCol))
        a = F.col(self.getOrDefault(self.labelItemsCol))
        k = self.getK()
        metric = self.getMetricName()
        if metric == "ndcg@k":
            col = ndcg_at_k(p, a, k)
        elif metric == "precision@k":
            col = precision_at_k(p, a, k)
        elif metric == "map":
            col = average_precision(p, a)
        else:
            raise ValueError(f"Unknown metricName {metric!r}")
        row = dataset.agg(F.avg(col).alias("m")).collect()[0]
        return float(row["m"]) if row["m"] is not None else 0.0

    def isLargerBetter(self) -> bool:
        return True
