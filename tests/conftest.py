"""Shared fixtures: one local SparkSession + deterministic albedo-shaped
tables (FIXTURES.md §A — user_info / repo_info / starring / relation).
Generation lives in ``albedo_spark.fixtures`` (also used by the CLI jobs);
this module only wraps it in session-scoped pytest fixtures."""

from __future__ import annotations

import pytest

from albedo_spark import fixtures as fx
from albedo_spark.fixtures import CURATOR_IDS, FIXED_USER_ID  # noqa: F401 (re-export)

N_USERS = 120
N_REPOS = 300


@pytest.fixture(scope="session")
def spark():
    from albedo_spark.session import get_spark

    # local[8], not the bench's local[$SPARK_GRAFT_CPUS]: test fixtures
    # are hundreds of rows, so stage cost here is scheduler overhead,
    # not compute — 32 scheduler threads measurably SLOW the suite
    # (streaming slice 202 s @32 vs 128 s @8; properties/functions 104
    # vs 88; 4 cores is worse again). The suite asserts semantics and
    # plan shape, neither of which depends on the local core count.
    s = get_spark("albedo-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def user_ids():
    return fx.make_user_ids(N_USERS)


@pytest.fixture(scope="session")
def repo_ids():
    return fx.make_repo_ids(N_REPOS)


@pytest.fixture(scope="session")
def user_info_df(spark, user_ids):
    return fx.make_user_info(spark, user_ids).cache()


@pytest.fixture(scope="session")
def repo_info_df(spark, repo_ids, user_ids):
    return fx.make_repo_info(spark, repo_ids, user_ids).cache()


@pytest.fixture(scope="session")
def starring_df(spark, user_ids, repo_ids):
    return fx.make_starring(spark, user_ids, repo_ids).cache()


@pytest.fixture(scope="session")
def relation_df(spark, user_ids):
    return fx.make_relation(spark, user_ids)
