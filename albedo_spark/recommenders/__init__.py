"""Candidate-generation recommenders behind one Transformer API
(SURVEY.md §2.11 M1-M5)."""

from albedo_spark.recommenders.base import Recommender
from albedo_spark.recommenders.als import ALSRecommender
from albedo_spark.recommenders.content import ContentRecommender
from albedo_spark.recommenders.curation import CurationRecommender
from albedo_spark.recommenders.popularity import PopularityRecommender

__all__ = [
    "Recommender",
    "ALSRecommender",
    "ContentRecommender",
    "CurationRecommender",
    "PopularityRecommender",
]
