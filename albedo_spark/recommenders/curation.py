"""CurationRecommender (M4).

Reference: ``S/recommenders/CurationRecommender.scala:16-43``: latest-starred
repos of 5 hand-picked curators, scored by star epoch-seconds, cross-joined
to every user. Same limit-before-crossJoin shape as popularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.recommenders.base import Recommender

DEFAULT_CURATOR_IDS = (652070, 1912583, 59990, 646843, 28702)
# vinta, saiday, tzangms, fukuball, wancw (CurationRecommender.scala:24)


class CurationRecommender(Recommender):
    """``starring_df`` is the raw starring table (user_id, repo_id,
    starred_at); curators configurable, defaulting to the reference's five."""

    def __init__(
        self,
        starring_df: DataFrame | None = None,
        curator_ids: Sequence[int] = DEFAULT_CURATOR_IDS,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.starring_df = starring_df
        self.curator_ids = list(curator_ids)

    source = "curation"

    def recommend_for_users(self, user_df: DataFrame) -> DataFrame:
        curated = (
            self.starring_df.select("repo_id", "starred_at")
            .where(F.col("user_id").isin(self.curator_ids))
            .groupBy("repo_id")
            .agg(F.max("starred_at").alias("starred_at"))
            .orderBy(F.col("starred_at").desc())
            .limit(self.getTopK())
        )
        return (
            user_df.select(self.getUserCol())
            .crossJoin(F.broadcast(curated))
            .select(
                F.col(self.getUserCol()),
                F.col("repo_id").alias(self.getItemCol()),
                F.col("starred_at").cast("long").cast("double").alias(self.getScoreCol()),
                F.lit(self.source).alias(self.getSourceCol()),
            )
        )
