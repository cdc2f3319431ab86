"""Single source of truth for schemas (SURVEY.md §1.3).

The reference declares every schema twice — Django/MySQL DDL
(``app/migrations/0001_initial.py:17-96``) and Scala case classes
(``S/schemas/package.scala:4-70``) — bridged by 24 ``withColumnRenamed``
calls (``S/utils/DatasetUtils.scala:58-106``). Here one module holds the
canonical ``StructType`` constants plus the feature registry that replaces
the reference's driver-side mutable ArrayBuffers
(``S/UserProfileBuilder.scala:45-49,204-213``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Albedo domain tables (canonical post-load shapes, schemas/package.scala:4-70)
# --------------------------------------------------------------------------

USER_INFO = StructType([
    StructField("user_id", IntegerType(), False),
    StructField("user_login", StringType(), False),
    StructField("user_account_type", StringType(), False),
    StructField("user_name", StringType(), True),
    StructField("user_company", StringType(), True),
    StructField("user_blog", StringType(), True),
    StructField("user_location", StringType(), True),
    StructField("user_email", StringType(), True),
    StructField("user_bio", StringType(), True),
    StructField("user_public_repos_count", IntegerType(), False),
    StructField("user_public_gists_count", IntegerType(), False),
    StructField("user_followers_count", IntegerType(), False),
    StructField("user_following_count", IntegerType(), False),
    StructField("user_created_at", TimestampType(), False),
    StructField("user_updated_at", TimestampType(), False),
])

REPO_INFO = StructType([
    StructField("repo_id", IntegerType(), False),
    StructField("repo_owner_id", IntegerType(), False),
    StructField("repo_owner_username", StringType(), False),
    StructField("repo_owner_type", StringType(), False),
    StructField("repo_name", StringType(), False),
    StructField("repo_full_name", StringType(), False),
    StructField("repo_description", StringType(), True),
    StructField("repo_language", StringType(), True),
    StructField("repo_created_at", TimestampType(), False),
    StructField("repo_updated_at", TimestampType(), False),
    StructField("repo_pushed_at", TimestampType(), False),
    StructField("repo_homepage", StringType(), True),
    StructField("repo_size", IntegerType(), False),
    StructField("repo_stargazers_count", IntegerType(), False),
    StructField("repo_forks_count", IntegerType(), False),
    StructField("repo_subscribers_count", IntegerType(), False),
    StructField("repo_is_fork", BooleanType(), False),
    StructField("repo_has_issues", BooleanType(), False),
    StructField("repo_has_projects", BooleanType(), False),
    StructField("repo_has_downloads", BooleanType(), False),
    StructField("repo_has_wiki", BooleanType(), False),
    StructField("repo_has_pages", BooleanType(), False),
    StructField("repo_open_issues_count", IntegerType(), False),
    StructField("repo_topics", StringType(), True),
])

# The "ratings" table for implicit ALS; rating constant 1.0
# (lit(1.0), S/utils/DatasetUtils.scala:118).
STARRING = StructType([
    StructField("user_id", IntegerType(), False),
    StructField("repo_id", IntegerType(), False),
    StructField("starred_at", TimestampType(), False),
    StructField("starring", DoubleType(), False),
])

# Loader-shaped 3-column relation (DatasetUtils.scala:125-136 — deliberately
# NOT the 5-field case class; see SURVEY.md §1.4 quirk #1).
RELATION = StructType([
    StructField("from_user_id", IntegerType(), False),
    StructField("to_user_id", IntegerType(), False),
    StructField("relation", StringType(), False),
])

# Recommendation output shape shared by every recommender
# (Recommender.transformSchema, S/recommenders/Recommender.scala:46-56).
RECOMMENDATION = StructType([
    StructField("user_id", IntegerType(), False),
    StructField("repo_id", IntegerType(), False),
    StructField("score", FloatType(), False),
    StructField("source", StringType(), False),
])

# --------------------------------------------------------------------------
# Driver TESTDATA tables (TESTDATA.md) — TPC-H-ish + LLM-pipeline tables
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DOCUMENTS = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("n_chars", LongType(), True),
])

EMBEDDINGS = StructType([
    StructField("vec_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
    StructField("label", IntegerType(), True),
])

EVENTS = StructType([
    StructField("event_id", LongType(), False),
    StructField("ts", TimestampType(), False),
    StructField("user_id", LongType(), False),
    StructField("event_type", StringType(), False),
    StructField("value", DoubleType(), True),
    StructField("props", StringType(), True),
])

# --------------------------------------------------------------------------
# Feature registry (replaces the reference's mutable driver-side lists,
# S/UserProfileBuilder.scala:45-49,204-213; S/LogisticRegressionRanker.scala:57-129)
# --------------------------------------------------------------------------

USER_FEATURES: dict[str, list[str]] = {
    "boolean": ["user_has_null", "user_has_blog", "user_binned_company_is_real",
                "user_knows_web", "user_knows_backend", "user_knows_ml",
                "user_knows_recsys", "user_is_lead", "user_is_scholar",
                "user_is_freelancer", "user_is_junior", "user_is_pm"],
    "continuous": ["user_public_repos_count", "user_public_gists_count",
                   "user_followers_count", "user_following_count",
                   "user_followers_following_ratio", "user_days_between_created_at_today",
                   "user_days_between_updated_at_today", "user_starred_repos_count",
                   "user_avg_daily_starred_repos_count"],
    "categorical": ["user_account_type", "user_binned_company",
                    "user_binned_location", "user_clean_email_domain"],
    "list": ["user_recent_repo_languages", "user_recent_repo_topics"],
    "text": ["user_text"],
}

REPO_FEATURES: dict[str, list[str]] = {
    "boolean": ["repo_has_issues", "repo_has_projects", "repo_has_downloads",
                "repo_has_wiki", "repo_has_pages", "repo_has_activities_in_60days",
                "repo_has_homepage", "repo_is_owner_active"],
    "continuous": ["repo_size", "repo_stargazers_count", "repo_forks_count",
                   "repo_subscribers_count", "repo_open_issues_count",
                   "repo_days_between_created_at_today",
                   "repo_days_between_updated_at_today",
                   "repo_days_between_pushed_at_today",
                   "repo_stargazers_subscribers_ratio",
                   "repo_stargazers_forks_ratio"],
    "categorical": ["repo_owner_type", "repo_clean_language"],
    "list": ["repo_clean_topics_list"],
    "text": ["repo_text"],
}


def assert_columns(df: DataFrame, required: dict[str, type]) -> None:
    """Runtime schema guard — the PySpark analogue of the reference's
    ``transformSchema`` requires (``S/recommenders/Recommender.scala:46-56``,
    nullability-insensitive comparison ``S/utils/SchemaUtils.scala:6-18``).
    """
    fields = {f.name: type(f.dataType) for f in df.schema.fields}
    for name, dtype in required.items():
        if name not in fields:
            raise ValueError(f"Column {name!r} must exist; have {sorted(fields)}")
        if fields[name] is not dtype:
            raise ValueError(
                f"Column {name!r} must be {dtype.__name__}, got {fields[name].__name__}"
            )
