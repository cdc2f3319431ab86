"""Deterministic albedo-shaped synthetic tables (FIXTURES.md §A):
user_info / repo_info / starring / relation, seeded with the reference's
seeds (ALS 42, ``S/ALSRecommenderBuilder.scala:52``; sampleBy 42,
``S/utils/DatasetUtils.scala:28``).

One source of truth for BOTH the test suite (tests/conftest.py delegates
here) and the CLI jobs (``python -m albedo_spark.jobs.popularity`` with no
--data-dir generates a dataset on the fly). Generation is driver-side
Python (bounded list sizes — fixtures, not production data); real
deployments point the jobs at parquet/JDBC tables instead.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from albedo_spark.schemas import RELATION, REPO_INFO, STARRING, USER_INFO

FIXED_USER_ID = 652070  # the reference's pinned spot-check user
CURATOR_IDS = (652070, 1912583, 59990, 646843, 28702)


def _ts(rng: random.Random, start: int = 2013, end: int = 2017) -> dt.datetime:
    base = dt.datetime(start, 1, 1)
    span = (dt.datetime(end, 6, 1) - base).total_seconds()
    return base + dt.timedelta(seconds=rng.randrange(int(span)))


def make_user_ids(n_users: int = 120) -> list[int]:
    rng = random.Random(42)
    ids = sorted(rng.sample(range(1, 10_000_000), n_users - len(CURATOR_IDS)))
    return ids + list(CURATOR_IDS)


def make_repo_ids(n_repos: int = 300) -> list[int]:
    rng = random.Random(43)
    return sorted(rng.sample(range(1, 20_000_000), n_repos))


def make_user_info(spark: SparkSession, user_ids: list[int]) -> DataFrame:
    rng = random.Random(44)
    companies = ["@Google", "google inc", "Facebook.com", "ex-Amazon", "小米",
                 "Microsoft", "", None, "freelancer", "ACME Co Ltd"]
    locations = ["San Francisco, CA", "Taipei, Taiwan", "東京, 日本", "Berlin",
                 "New York City", "", None]
    bios = ["full stack developer", "machine learning phd", "freelance hacker",
            "product manager", "junior engineer", "deep learning researcher",
            None, ""]
    rows = []
    for uid in user_ids:
        created = _ts(rng, 2008, 2016)
        company = f"RareCorp{uid}" if rng.random() < 0.1 else rng.choice(companies)
        rows.append((
            uid, f"user{uid}", "Organization" if rng.random() < 0.05 else "User",
            None if rng.random() < 0.2 else f"Name {uid}",
            company, "" if rng.random() < 0.7 else f"https://blog{uid}.io",
            rng.choice(locations), None if rng.random() < 0.5 else f"u{uid}@example.com",
            rng.choice(bios), rng.randrange(500), rng.randrange(200),
            int(rng.paretovariate(1.2) * 10), rng.randrange(2000),
            created, created + dt.timedelta(days=rng.randrange(300)),
        ))
    return spark.createDataFrame(rows, USER_INFO)


def make_repo_info(
    spark: SparkSession, repo_ids: list[int], user_ids: list[int]
) -> DataFrame:
    rng = random.Random(45)
    langs = ["JavaScript", "Python", "Java", "Go", "Ruby", "C++", "Rust",
             "TypeScript", "", None, "Elm", "Nim"]
    descs = ["a web framework", "deprecated, no longer maintained", "my blog",
             "demo project for class", "machine learning toolkit", "作業",
             None, "", "awesome curated list"]
    rows = []
    for rid in repo_ids:
        owner = rng.choice(user_ids)
        stars = int(rng.paretovariate(0.6)) + rng.choice([0, 30, 1000, 5000])
        created = _ts(rng, 2010, 2016)
        lang = f"RareLang{rid % 7}" if rng.random() < 0.04 else rng.choice(langs)
        rows.append((
            rid, owner, f"user{owner}", "User", f"repo{rid}",
            f"user{owner}/repo{rid}", rng.choice(descs),
            lang, created,
            created + dt.timedelta(days=rng.randrange(400)),
            created + dt.timedelta(days=rng.randrange(500)),
            "" if rng.random() < 0.6 else f"https://repo{rid}.dev",
            rng.randrange(500_000), min(stars, 400_000),
            int(min(stars, 400_000) * rng.random() * 0.3),
            int(min(stars, 400_000) * rng.random() * 0.2),
            rng.random() < 0.1, True, rng.random() < 0.5, True,
            rng.random() < 0.5, rng.random() < 0.2, rng.randrange(500),
            "python,machine-learning" if rng.random() < 0.3 else
            ("web,framework" if rng.random() < 0.3 else ""),
        ))
    return spark.createDataFrame(rows, REPO_INFO)


def make_starring(
    spark: SparkSession, user_ids: list[int], repo_ids: list[int]
) -> DataFrame:
    rng = random.Random(46)
    rows = []
    seen = set()
    for uid in user_ids:
        n = 30 + int(rng.paretovariate(1.0) * 5) if uid in CURATOR_IDS else (
            1 + int(rng.paretovariate(0.9) * 3)
        )
        n = min(n, 80)
        for rid in rng.sample(repo_ids, min(n, len(repo_ids))):
            if (uid, rid) in seen:
                continue
            seen.add((uid, rid))
            rows.append((uid, rid, _ts(rng), 1.0))
    return spark.createDataFrame(rows, STARRING)


def make_relation(spark: SparkSession, user_ids: list[int]) -> DataFrame:
    rng = random.Random(47)
    rows = []
    for _ in range(300):
        a, b = rng.sample(user_ids, 2)
        rows.append((a, b, rng.choice(["followed", "starred"])))
    return spark.createDataFrame(rows, RELATION)


def generate_dataset(
    spark: SparkSession, n_users: int = 120, n_repos: int = 300
) -> dict[str, DataFrame]:
    """All four albedo-shaped tables, keyed by name."""
    user_ids = make_user_ids(n_users)
    repo_ids = make_repo_ids(n_repos)
    return {
        "user_info": make_user_info(spark, user_ids),
        "repo_info": make_repo_info(spark, repo_ids, user_ids),
        "starring": make_starring(spark, user_ids, repo_ids),
        "relation": make_relation(spark, user_ids),
    }
