"""albedo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vinta/albedo, rebuilt Spark-first.

The reference (https://github.com/vinta/albedo) is a GitHub-repository
recommender built on Spark 2.2 Scala; this package re-expresses its entire
operator surface (SURVEY.md §2) with the modern PySpark DataFrame API and
extends it with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Design rules (SURVEY.md §7.1):
- DataFrame/SQL only; no RDDs.
- Catalyst does the optimizing; we declare, it plans.
- Python UDFs are a last resort — native column expressions first,
  Arrow-backed pandas UDFs second.
"""

__version__ = "0.1.0"
