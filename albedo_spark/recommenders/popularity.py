"""PopularityRecommender (M2).

Reference: ``S/recommenders/PopularityRecommender.scala:16-37``:
top-topK popular repos (from popularRepoDF = stargazers BETWEEN 1000 AND
290000 sorted desc, ``S/utils/DatasetUtils.scala:148-160``) cross-joined to
every user with score

    round(log10(stargazers), 3) + (epoch_seconds/(60·60·24·30·12))/5

The reference computes the score in a row-UDF; here it is a native
expression (F9 → SURVEY.md §2.10). The small side is ``limit(topK)``-ed
BEFORE the crossJoin (the reference's own optimization, kept) so the
product is |users|×topK and the popular side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from albedo_spark.recommenders.base import Recommender

POPULAR_STARS_MIN = 1000
POPULAR_STARS_MAX = 290000


def build_popular_repo_df(repo_info: DataFrame) -> DataFrame:
    """popularRepoDF (S/utils/DatasetUtils.scala:148-160)."""
    return (
        repo_info.select("repo_id", "repo_stargazers_count", "repo_created_at")
        .where(
            F.col("repo_stargazers_count").between(POPULAR_STARS_MIN, POPULAR_STARS_MAX)
        )
        .orderBy(F.col("repo_stargazers_count").desc())
    )


def popularity_score(stargazers_count: Column, created_at: Column) -> Column:
    """Native F9: value term round(log10(stars)·1000)/1000 + recency term
    (epoch/“months”)/5 (PopularityRecommender.scala:26-30)."""
    value_score = F.round(F.log10(stargazers_count), 3)
    time_score = (created_at.cast("long") / (60 * 60 * 24 * 30 * 12)) / 5.0
    return value_score + time_score


class PopularityRecommender(Recommender):
    """DataFrame-in, DataFrame-out popularity candidates.

    ``popular_repo_df`` is injected (reference loads it from the memoized
    snapshot); it must have repo_id / repo_stargazers_count /
    repo_created_at and be sorted by popularity desc.
    """

    def __init__(self, popular_repo_df: DataFrame | None = None, **kwargs):
        super().__init__(**kwargs)
        self.popular_repo_df = popular_repo_df

    source = "popularity"

    def recommend_for_users(self, user_df: DataFrame) -> DataFrame:
        top = self.popular_repo_df.limit(self.getTopK())
        return (
            user_df.select(self.getUserCol())
            .crossJoin(F.broadcast(top))
            .select(
                F.col(self.getUserCol()),
                F.col("repo_id").alias(self.getItemCol()),
                popularity_score(
                    F.col("repo_stargazers_count"), F.col("repo_created_at")
                ).alias(self.getScoreCol()),
                F.lit(self.source).alias(self.getSourceCol()),
            )
        )
