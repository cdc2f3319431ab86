"""JDBC source exercised against a REAL database (embedded Apache Derby,
which ships in Spark's jars) — not a mock: rows go out through Spark's JDBC
sink into Derby and come back through ``read_jdbc``, covering the
partitioned-read bounds and the raw→canonical rename bridge
(S/utils/DatasetUtils.scala:57-106; the reference's primary source is a
MySQL JDBC read per table)."""

from __future__ import annotations

import datetime as dt

import pytest

from albedo_spark.io import (
    REPO_INFO_RENAMES,
    USER_INFO_RENAMES,
    canonicalize_columns,
    read_jdbc,
    read_jdbc_canonical,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db_dir};create=true"
    props = {"driver": DERBY_DRIVER}

    raw = spark.createDataFrame(
        [
            (
                i,
                1000 + i % 7,
                f"owner{i % 7}",
                f"repo-{i}",
                "Python" if i % 3 else "Scala",
                dt.datetime(2017, 1, 1 + i % 28),
                10 * i,
                i % 2 == 0,
            )
            for i in range(1, 101)
        ],
        "id long, owner_id long, owner_username string, name string, "
        "language string, created_at timestamp, stargazers_count long, "
        "fork boolean",
    )
    (
        raw.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "app_repoinfo")
        .option("driver", DERBY_DRIVER)
        # Derby's default StringType mapping is CLOB, which can't take
        # pushed-down equality predicates; real MySQL columns are VARCHAR,
        # so model that here.
        .option(
            "createTableColumnTypes",
            "owner_username VARCHAR(64), name VARCHAR(128), language VARCHAR(32)",
        )
        .mode("overwrite")
        .save()
    )
    return url, props, raw


def test_read_jdbc_roundtrip(spark, derby):
    url, props, raw = derby
    back = read_jdbc(spark, url, "app_repoinfo", props)
    assert sorted(back.columns) == sorted(raw.columns)
    assert back.count() == 100
    a = sorted(tuple(r) for r in raw.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_read_jdbc_partitioned_bounds(spark, derby):
    url, props, raw = derby
    df = read_jdbc(
        spark, url, "app_repoinfo", props,
        partition_column="id", num_partitions=4,
        lower_bound=1, upper_bound=101,
    )
    # bounds only split the scan; they must not filter rows
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    sizes = df.rdd.glom().map(len).collect()
    assert sum(sizes) == 100 and max(sizes) < 100  # actually split


def test_canonical_renames(spark, derby):
    url, props, _ = derby
    df = read_jdbc_canonical(
        spark, url, "app_repoinfo", props, REPO_INFO_RENAMES,
        partition_column="id", num_partitions=2,
        lower_bound=1, upper_bound=101,
    )
    assert "repo_id" in df.columns and "id" not in df.columns
    assert "repo_owner_username" in df.columns
    assert "repo_stargazers_count" in df.columns and "repo_is_fork" in df.columns
    filtered = df.where("repo_language = 'Scala'")
    assert filtered.count() > 0
    # the filter must push through the rename projection INTO the JDBC scan
    # (ships as SQL to the database; only matching rows cross the wire)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "language" in plan


def test_rename_maps_cover_reference_tables():
    """The two maps mirror DatasetUtils.scala:58-106 — 15 user + 24 repo
    renames, disjoint canonical names, all prefixed."""
    assert len(USER_INFO_RENAMES) == 15
    assert len(REPO_INFO_RENAMES) == 24
    assert all(v.startswith("user_") for v in USER_INFO_RENAMES.values())
    assert all(v.startswith("repo_") for v in REPO_INFO_RENAMES.values())


def test_canonicalize_passthrough(spark):
    df = spark.createDataFrame([(1, "x")], "id long, other string")
    out = canonicalize_columns(df, {"id": "user_id"})
    assert out.columns == ["user_id", "other"]
