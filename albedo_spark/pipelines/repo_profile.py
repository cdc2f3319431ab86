"""RepoProfileBuilder — reference ``S/RepoProfileBuilder.scala``.

Impute → hard filters (non-fork, forks ≤ 90000, stars BETWEEN 30 AND
100000) → description-based junk filters (unmaintained/assignment/demo/blog,
P7 LIKE-folds, the demo/blog ones gated on stars ≤ 40) → derived features →
language frequency binning.

Deltas as in user_profile: explicit ``today``; the vinta-starred flag takes
the starred-id set from a join against the starring table instead of a
driver ``collect`` + ``isin`` (A7 → broadcast join; the collect ceases to
fit the driver when the pinned user is replaced by a big curator set).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.functions import flag_any_like

UNMAINTAINED_WORDS = ["%unmaintained%", "%no longer maintained%",
                      "%no longer actively maintained%", "%not maintained%",
                      "%not actively maintained%", "%deprecated%", "%moved to%"]
ASSIGNMENT_WORDS = ["%assignment%", "%作業%", "%作业%"]
DEMO_WORDS = ["test", "%demo project%"]  # 'test' is exact-match in the reference
BLOG_WORDS = ["my blog"]

NULLABLE_REPO_COLS = ["repo_description", "repo_homepage"]

PINNED_USER_ID = 652070


def build_repo_profile(
    repo_info: DataFrame,
    starring: DataFrame,
    today: dt.date | None = None,
    language_bin_threshold: int = 30,
    pinned_user_id: int = PINNED_USER_ID,
) -> DataFrame:
    today_col = F.lit(today).cast("date") if today else F.current_date()

    imputed = repo_info.withColumn(
        "repo_has_null",
        F.col("repo_description").isNull() | F.col("repo_homepage").isNull(),
    ).na.fill("", NULLABLE_REPO_COLS)

    reduced = (
        imputed.where(~F.col("repo_is_fork"))
        .where(F.col("repo_forks_count") <= 90000)
        .where(F.col("repo_stargazers_count").between(30, 100000))
    )

    desc = F.col("repo_clean_description")
    clean = (
        reduced.withColumn("repo_clean_description", F.lower("repo_description"))
        .withColumn(
            "repo_is_unmaintained", flag_any_like(desc, UNMAINTAINED_WORDS) == 1.0
        )
        .withColumn("repo_is_assignment", flag_any_like(desc, ASSIGNMENT_WORDS) == 1.0)
        .withColumn(
            "repo_is_demo",
            (flag_any_like(desc, DEMO_WORDS) == 1.0)
            & (F.col("repo_stargazers_count") <= 40),
        )
        .withColumn(
            "repo_is_blog",
            (flag_any_like(desc, BLOG_WORDS) == 1.0)
            & (F.col("repo_stargazers_count") <= 40),
        )
        .where(~F.col("repo_is_unmaintained"))
        .where(~F.col("repo_is_assignment"))
        .where(~F.col("repo_is_demo"))
        .where(~F.col("repo_is_blog"))
        .withColumn("repo_clean_language", F.lower("repo_language"))
    )

    pinned_starred = starring.where(F.col("user_id") == pinned_user_id).select(
        "repo_id"
    ).distinct()

    constructed = (
        clean.withColumn(
            "repo_has_activities_in_60days",
            F.datediff(today_col, F.col("repo_pushed_at")) <= 60,
        )
        .withColumn("repo_has_homepage", F.col("repo_homepage") != "")
        .join(
            F.broadcast(pinned_starred.withColumn("repo_is_vinta_starred", F.lit(True))),
            "repo_id",
            "left",
        )
        .na.fill({"repo_is_vinta_starred": False})
        .withColumn(
            "repo_days_between_created_at_today",
            F.datediff(today_col, F.col("repo_created_at")),
        )
        .withColumn(
            "repo_days_between_updated_at_today",
            F.datediff(today_col, F.col("repo_updated_at")),
        )
        .withColumn(
            "repo_days_between_pushed_at_today",
            F.datediff(today_col, F.col("repo_pushed_at")),
        )
        .withColumn(
            "repo_subscribers_stargazers_ratio",
            F.round(F.col("repo_subscribers_count") / (F.col("repo_stargazers_count") + 1.0), 3),
        )
        .withColumn(
            "repo_forks_stargazers_ratio",
            F.round(F.col("repo_forks_count") / (F.col("repo_stargazers_count") + 1.0), 3),
        )
        .withColumn(
            "repo_open_issues_stargazers_ratio",
            F.round(F.col("repo_open_issues_count") / (F.col("repo_stargazers_count") + 1.0), 3),
        )
        .withColumn(
            "repo_text",
            F.lower(
                F.concat_ws(
                    " ", "repo_owner_username", "repo_name", "repo_language",
                    "repo_description",
                )
            ),
        )
    )

    language_counts = clean.groupBy("repo_clean_language").agg(
        F.count("*").alias("count_per_repo_language")
    )
    transformed = (
        constructed.join(F.broadcast(language_counts), "repo_clean_language")
        .withColumn(
            "repo_binned_language",
            F.when(
                F.col("count_per_repo_language") <= language_bin_threshold, "__other"
            ).otherwise(F.col("repo_clean_language")),
        )
        .withColumn("repo_clean_topics", F.split("repo_topics", ","))
    )

    feature_cols = (
        # id/raw block (RepoProfileBuilder.scala:164 — repo_created_at etc.
        # must survive: the ranker's weight SQL reads them)
        ["repo_id", "repo_full_name", "repo_owner_id", "repo_language",
         "repo_created_at", "repo_updated_at", "repo_pushed_at"]
        # boolean
        + ["repo_has_issues", "repo_has_projects", "repo_has_downloads",
           "repo_has_wiki", "repo_has_pages", "repo_has_null",
           "repo_has_activities_in_60days", "repo_has_homepage",
           "repo_is_vinta_starred"]
        # continuous
        + ["repo_size", "repo_stargazers_count", "repo_forks_count",
           "repo_subscribers_count", "repo_open_issues_count",
           "repo_days_between_created_at_today",
           "repo_days_between_updated_at_today",
           "repo_days_between_pushed_at_today",
           "repo_subscribers_stargazers_ratio", "repo_forks_stargazers_ratio",
           "repo_open_issues_stargazers_ratio"]
        # categorical (repo_language already in the id/raw block)
        + ["repo_owner_type", "repo_binned_language"]
        # list
        + ["repo_clean_topics"]
        # text
        + ["repo_text"]
    )
    return transformed.select(*[F.col(c) for c in feature_cols])
