"""Custom pyspark.ml Transformer stages (SURVEY.md §2.11 M7-M12)."""

from albedo_spark.transformers.intermediate_cacher import IntermediateCacher
from albedo_spark.transformers.negative_balancer import NegativeBalancer
from albedo_spark.transformers.ranking_formatter import RankingMetricFormatter
from albedo_spark.transformers.user_repo import UserRepoTransformer

__all__ = [
    "IntermediateCacher",
    "NegativeBalancer",
    "RankingMetricFormatter",
    "UserRepoTransformer",
]
