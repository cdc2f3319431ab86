"""Shared fixtures: one local SparkSession + deterministic albedo-shaped
tables (FIXTURES.md §A — user_info / repo_info / starring / relation),
seeded with 42 like the reference's ALS and sampleBy seeds."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import SparkSession

from albedo_spark.schemas import RELATION, REPO_INFO, STARRING, USER_INFO

N_USERS = 120
N_REPOS = 300
FIXED_USER_ID = 652070  # the reference's pinned spot-check user
CURATOR_IDS = (652070, 1912583, 59990, 646843, 28702)


@pytest.fixture(scope="session")
def spark():
    from albedo_spark.session import get_spark

    s = get_spark("albedo-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ts(rng: random.Random, start: int = 2013, end: int = 2017) -> dt.datetime:
    base = dt.datetime(start, 1, 1)
    span = (dt.datetime(end, 6, 1) - base).total_seconds()
    return base + dt.timedelta(seconds=rng.randrange(int(span)))


@pytest.fixture(scope="session")
def user_ids():
    rng = random.Random(42)
    ids = sorted(rng.sample(range(1, 10_000_000), N_USERS - len(CURATOR_IDS)))
    return ids + list(CURATOR_IDS)


@pytest.fixture(scope="session")
def repo_ids():
    rng = random.Random(43)
    return sorted(rng.sample(range(1, 20_000_000), N_REPOS))


@pytest.fixture(scope="session")
def user_info_df(spark, user_ids):
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
    return spark.createDataFrame(rows, USER_INFO).cache()


@pytest.fixture(scope="session")
def repo_info_df(spark, repo_ids, user_ids):
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
    return spark.createDataFrame(rows, REPO_INFO).cache()


@pytest.fixture(scope="session")
def starring_df(spark, user_ids, repo_ids):
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
    return spark.createDataFrame(rows, STARRING).cache()


@pytest.fixture(scope="session")
def relation_df(spark, user_ids):
    rng = random.Random(47)
    rows = []
    for _ in range(300):
        a, b = rng.sample(user_ids, 2)
        rows.append((a, b, rng.choice(["followed", "starred"])))
    return spark.createDataFrame(rows, RELATION)
