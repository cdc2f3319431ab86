"""Reusable relational operators.

``topk`` carries the reference's single most important idiom (W1); the
``dedup`` / ``similarity`` / ``textstats`` / ``sessions`` modules are the
training-data-pipeline extensions designed for 100 TB inputs.
"""

from albedo_spark.operators.topk import global_top_k, top_k_per_group

__all__ = ["global_top_k", "top_k_per_group"]
