"""Batch feature-engineering pipelines (reference entry points E1/E3)."""

from albedo_spark.pipelines.repo_profile import build_repo_profile
from albedo_spark.pipelines.user_profile import build_user_profile

__all__ = ["build_repo_profile", "build_user_profile"]
