"""CrossValidator variants of the ALS recommender and the LR ranker.

Reference: ``S/ALSRecommenderCV.scala:67-90`` (grid over rank/regParam/
alpha/maxIter, 2 folds, ranking-NDCG@30 selection) and
``S/LogisticRegressionRankerCV.scala:326-350`` (grid over the four sample
weight columns). Both use the reference's trick of an evaluator that
carries the user→actual-items table and joins it onto whatever the
pipeline emits — reproduced here as ``ActualItemsRankingEvaluator``.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.recommendation import ALS
from pyspark.ml.tuning import CrossValidator, CrossValidatorModel, ParamGridBuilder
from pyspark.sql import DataFrame

from albedo_spark.evaluators import RankingEvaluator
from albedo_spark.transformers import RankingMetricFormatter

ALS_CV_GRID = {  # ALSRecommenderCV.scala:67-73
    "rank": [50, 70],
    "regParam": [0.1, 0.5],
    "alpha": [0.1, 40.0],
    "maxIter": [20],
}

LR_CV_WEIGHT_COLS = [  # LogisticRegressionRankerCV.scala:326-338
    "positive_weight",
    # The CV reference's weightSQL names this axis recentStarredWeight; the
    # repo's single weight_sql() (pipelines/ranker.py, following
    # LogisticRegressionRanker.scala:320) emits it as positive_starred_weight.
    # Use the repo's name so default ranker_cv() resolves on repo-built data.
    "positive_starred_weight",
    "positive_created_weight",
    "positive_created_week_weight",
]


class ActualItemsRankingEvaluator(RankingEvaluator):
    """RankingEvaluator that joins a held user→actual_items table onto the
    evaluated dataset first (the reference evaluator's constructor takes
    userActualItemsDF, ``S/evaluators/RankingEvaluator.scala:20-28``) —
    required for CrossValidator, whose folds only carry predictions."""

    def __init__(self, actual_items_df: DataFrame, user_col: str = "user_id", **kwargs):
        super().__init__(**kwargs)
        self.actual_items_df = actual_items_df
        self.user_col = user_col

    def _evaluate(self, dataset: DataFrame) -> float:
        joined = dataset.join(self.actual_items_df, self.user_col)
        return super()._evaluate(joined)


def als_cv(
    starring_df: DataFrame,
    actual_items_df: DataFrame,
    grid: dict[str, list] | None = None,
    num_folds: int = 2,
    k: int = 30,
    seed: int = 42,
) -> CrossValidatorModel:
    """Grid-search implicit ALS by ranking NDCG@k over CV folds.

    Pipeline = ALS → RankingMetricFormatter('als'), so each fold's test
    predictions become per-user ordered top-k lists before evaluation —
    exactly the reference's model pipeline (ALSRecommenderCV.scala:46-63).
    """
    als = ALS(
        implicitPrefs=True,
        seed=seed,
        coldStartStrategy="drop",
        userCol="user_id",
        itemCol="repo_id",
        ratingCol="starring",
    )
    formatter = RankingMetricFormatter(
        sourceType="als", predictionCol="prediction", topK=k
    )
    builder = ParamGridBuilder()
    for name, values in (grid or ALS_CV_GRID).items():
        builder = builder.addGrid(als.getParam(name), values)
    cv = CrossValidator(
        estimator=Pipeline(stages=[als, formatter]),
        estimatorParamMaps=builder.build(),
        evaluator=ActualItemsRankingEvaluator(
            actual_items_df, metricName="ndcg@k", k=k
        ),
        numFolds=num_folds,
        seed=seed,
    )
    return cv.fit(starring_df)


def ranker_cv(
    featured_df: DataFrame,
    weight_cols: list[str] | None = None,
    num_folds: int = 2,
    seed: int = 42,
    **lr_fixed,
) -> CrossValidatorModel:
    """Grid-search the LR ranker over sample-weight columns by AUC
    (LogisticRegressionRankerCV.scala:326-350: standardization=true,
    maxIter=150, regParam=0.7, elasticNet=0 pinned; the grid axis is WHICH
    weighting scheme to train with)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    lr = LogisticRegression(
        standardization=True,
        maxIter=lr_fixed.pop("maxIter", 150),
        regParam=lr_fixed.pop("regParam", 0.7),
        elasticNetParam=0.0,
        featuresCol="features",
        labelCol="starring",
        **lr_fixed,
    )
    builder = ParamGridBuilder().addGrid(
        lr.weightCol, weight_cols or LR_CV_WEIGHT_COLS
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=builder.build(),
        evaluator=BinaryClassificationEvaluator(
            labelCol="starring", metricName="areaUnderROC"
        ),
        numFolds=num_folds,
        seed=seed,
    )
    return cv.fit(featured_df)


def ranker_cv_full(
    featured_df: DataFrame,
    today=None,
    weight_cols: list[str] | None = None,
    num_folds: int = 2,
    seed: int = 42,
    **lr_overrides,
) -> CrossValidatorModel:
    """CV through the COMPLETE model pipeline (weight SQLTransformer + LR,
    ``build_model_pipeline``), gridding the LR stage's weightCol — the
    exact training DAG the ranker job deploys, so the selected weighting
    is validated under the same per-fold weight computation it will see in
    production (LogisticRegressionRankerCV.scala:326-350). ``ranker_cv``
    above is the lighter pre-weighted variant."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from albedo_spark.pipelines.ranker import build_model_pipeline

    pipe = build_model_pipeline(today=today, **lr_overrides)
    lr = pipe.getStages()[-1]
    builder = ParamGridBuilder().addGrid(
        lr.weightCol, weight_cols or LR_CV_WEIGHT_COLS
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=builder.build(),
        evaluator=BinaryClassificationEvaluator(
            labelCol="starring", metricName="areaUnderROC"
        ),
        numFolds=num_folds,
        seed=seed,
    )
    return cv.fit(featured_df)


def best_params_report(cv_model: CrossValidatorModel) -> list[tuple[dict, float]]:
    """(param-map → avg metric) pairs, best first — the reference's
    'Show Best Parameters' block (ALSRecommenderCV.scala:92-96)."""
    pairs = [
        ({p.name: v for p, v in pm.items()}, float(m))
        for pm, m in zip(cv_model.getEstimatorParamMaps(), cv_model.avgMetrics)
    ]
    return sorted(pairs, key=lambda t: -t[1])
