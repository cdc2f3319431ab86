"""Shared harness for the CLI jobs: args, table loading, the reference's
evaluation protocol, and the pinned-user spot-check table."""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from albedo_spark.evaluators import RankingEvaluator
from albedo_spark.evaluators.ranking import user_actual_items
from albedo_spark.fixtures import FIXED_USER_ID, generate_dataset
from albedo_spark.operators.topk import top_k_lists_per_group

TABLES = ("user_info", "repo_info", "starring", "relation")


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--data-dir",
        help="directory holding user_info/repo_info/starring/relation parquet; "
        "omitted -> seeded synthetic fixtures",
    )
    p.add_argument("--n-users", type=int, default=120, help="fixture size")
    p.add_argument("--n-repos", type=int, default=300, help="fixture size")
    p.add_argument("--top-k", type=int, default=30)
    p.add_argument("--eval-sample", type=int, default=250,
                   help="users sampled for NDCG (reference: ~250 + pinned user)")
    p.add_argument("--master", default="local[*]")
    return p


def get_session(args: argparse.Namespace, name: str) -> SparkSession:
    from albedo_spark.session import get_spark

    spark = get_spark(f"albedo-job-{name}", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def load_tables(spark: SparkSession, args: argparse.Namespace) -> dict[str, DataFrame]:
    if args.data_dir:
        return {t: spark.read.parquet(f"{args.data_dir}/{t}") for t in TABLES}
    return generate_dataset(spark, n_users=args.n_users, n_repos=args.n_repos)


def repo_text(repo_info: DataFrame) -> DataFrame:
    """(repo_id, text) corpus for the content recommender: description +
    topics + language, the fields the reference indexes into Elasticsearch
    (``S/ContentRecommenderBuilder.scala:41-55`` equivalents)."""
    return repo_info.select(
        "repo_id",
        F.concat_ws(
            " ",
            F.coalesce("repo_description", F.lit("")),
            F.coalesce("repo_topics", F.lit("")),
            F.coalesce("repo_language", F.lit("")),
        ).alias("text"),
    )


def sample_test_users(
    starring: DataFrame, sample: int, seed: int = 42
) -> DataFrame:
    """~`sample` random starring users + the pinned spot-check user —
    the reference's evaluation population (README NDCG protocol)."""
    users = starring.select("user_id").distinct()
    n = users.count()
    frac = min(1.0, sample / max(n, 1))
    picked = users.sample(withReplacement=False, fraction=frac, seed=seed)
    pinned = users.where(F.col("user_id") == FIXED_USER_ID)
    return picked.unionByName(pinned).distinct()


def evaluate_ndcg(
    rec_df: DataFrame, starring: DataFrame, test_users: DataFrame, k: int
) -> float:
    """Reference protocol: predictions ordered by score; actuals = top-k
    most recent stars from the FULL starring table (SURVEY §1.4 #3)."""
    pred = top_k_lists_per_group(
        rec_df,
        "user_id",
        "repo_id",
        [F.col("score").desc(), F.col("repo_id").desc()],
        k,
        list_col="pred_items",
    )
    actual = user_actual_items(
        starring.join(test_users, "user_id", "left_semi"), k=k
    )
    joined = pred.join(actual, "user_id")
    return RankingEvaluator(metricName="ndcg@k", k=k).evaluate(joined)


def show_pinned_user(rec_df: DataFrame, repo_info: DataFrame, k: int) -> None:
    """Top-k table for user 652070 — the reference builders' spot check
    (``S/PopularityRecommenderBuilder.scala:56-79``)."""
    out = (
        rec_df.where(F.col("user_id") == FIXED_USER_ID)
        .join(repo_info.select("repo_id", "repo_full_name"), "repo_id", "left")
        .orderBy(F.col("score").desc(), F.col("repo_id"))
        .select("user_id", "repo_id", "repo_full_name", "score", "source")
        .limit(k)
    )
    out.show(k, truncate=False)


def run_and_report(
    name: str,
    rec_df: DataFrame,
    tables: dict[str, DataFrame],
    test_users: DataFrame,
    k: int,
) -> float:
    rec_df = rec_df.cache()
    ndcg = evaluate_ndcg(rec_df, tables["starring"], test_users, k)
    print(f"{name} NDCG@{k} = {ndcg}")
    show_pinned_user(rec_df, tables["repo_info"], k)
    return ndcg
