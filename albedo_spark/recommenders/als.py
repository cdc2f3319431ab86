"""ALSRecommender (M3).

Reference: ``S/recommenders/ALSRecommender.scala:28-66`` hand-rolls factor
top-k: blockified crossJoin of user×item factors, per-pair BLAS sdot, and a
copied-from-Spark ``BoundedPriorityQueue`` heap (O4). All of that is
superseded by ``ALSModel.recommendForUserSubset`` (built-in since Spark 2.3
— itself blocked + BLAS internally, SURVEY.md J4 note) followed by one
``explode``; this file is deliberately ~20 lines of plan, not 120 of
execution machinery.

Training params (reference: ``S/ALSRecommenderBuilder.scala:46-58``):
implicitPrefs=True, rank=50, regParam=0.5, alpha=40, maxIter=26, seed=42,
coldStartStrategy='drop'.
"""

from __future__ import annotations

from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.recommenders.base import Recommender

REFERENCE_ALS_PARAMS = dict(
    implicitPrefs=True,
    rank=50,
    regParam=0.5,
    alpha=40.0,
    maxIter=26,
    seed=42,
    coldStartStrategy="drop",
    userCol="user_id",
    itemCol="repo_id",
    ratingCol="starring",
)


def train_als(
    starring_df: DataFrame,
    checkpoint_dir: str | None = None,
    **overrides,
) -> ALSModel:
    """Fit the reference-configured implicit ALS on the starring matrix.

    ``checkpoint_dir`` (S12, ``S/ALSRecommenderBuilder.scala:36``) truncates
    the factor lineage every ``checkpointInterval`` iterations — at the
    reference's maxIter=26 the unchecked lineage grows one stage pair per
    iteration and the DAG replays from the raw ratings on any executor
    loss; with a checkpoint dir, recovery restarts from the last
    materialized factors instead. Set it for any real iteration count."""
    params = {**REFERENCE_ALS_PARAMS, **overrides}
    if checkpoint_dir is not None:
        starring_df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return ALS(**params).fit(starring_df)


class ALSRecommender(Recommender):
    def __init__(self, als_model: ALSModel | None = None, **kwargs):
        super().__init__(**kwargs)
        self.als_model = als_model

    source = "als"

    def recommend_for_users(self, user_df: DataFrame) -> DataFrame:
        user_col = self.getUserCol()
        recs = self.als_model.recommendForUserSubset(
            user_df.select(user_col), self.getTopK()
        )
        return recs.select(
            F.col(user_col),
            F.explode("recommendations").alias("rec"),
        ).select(
            F.col(user_col),
            F.col("rec.repo_id").alias(self.getItemCol()),
            F.col("rec.rating").cast("double").alias(self.getScoreCol()),
            F.lit(self.source).alias(self.getSourceCol()),
        )
