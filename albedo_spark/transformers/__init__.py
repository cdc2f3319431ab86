"""Custom pyspark.ml Transformer stages (SURVEY.md §2.11 M7-M14)."""

from albedo_spark.transformers.func import FuncTransformer
from albedo_spark.transformers.intermediate_cacher import IntermediateCacher
from albedo_spark.transformers.negative_balancer import NegativeBalancer
from albedo_spark.transformers.ranking_formatter import RankingMetricFormatter
from albedo_spark.transformers.stemmer import SnowballStemmer
from albedo_spark.transformers.tokenizer import NativeTokenizer
from albedo_spark.transformers.user_repo import UserRepoTransformer

__all__ = [
    "FuncTransformer",
    "IntermediateCacher",
    "NativeTokenizer",
    "NegativeBalancer",
    "RankingMetricFormatter",
    "SnowballStemmer",
    "UserRepoTransformer",
]
