"""Profile-builder pipeline tests on the seeded fixtures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from albedo_spark.pipelines import build_repo_profile, build_user_profile

TODAY = dt.date(2017, 9, 1)


@pytest.fixture(scope="module")
def user_profile(user_info_df, repo_info_df, starring_df):
    return build_user_profile(
        user_info_df, repo_info_df, starring_df, today=TODAY,
        company_bin_threshold=2, location_bin_threshold=5,
    ).cache()


@pytest.fixture(scope="module")
def repo_profile(repo_info_df, starring_df):
    return build_repo_profile(
        repo_info_df, starring_df, today=TODAY, language_bin_threshold=5
    ).cache()


def test_user_profile_shape(user_profile, user_info_df):
    assert user_profile.count() > 0
    # inner-join semantics: only users with ≥1 star survive (J1 note)
    assert user_profile.count() <= user_info_df.count()
    assert user_profile.select("user_id").distinct().count() == user_profile.count()
    # 2 id + 14 boolean + 9 continuous + 3 categorical + 2 list + 2 text
    assert len(user_profile.columns) == 32


def test_user_profile_features(user_profile):
    rows = user_profile.collect()
    for r in rows:
        assert r.user_starred_repos_count >= 1
        assert len(r.user_recent_repo_languages) <= 50
        assert r.user_binned_company is not None
        assert r.user_days_between_created_at_today > 0
    # someone must have a flag set (fixtures sprinkle keyword bios)
    assert any(r.user_knows_data for r in rows)
    assert any(r.user_is_scholar for r in rows)
    assert any(r.user_binned_company == "__other" for r in rows)


def test_user_profile_deterministic(user_info_df, repo_info_df, starring_df):
    a = build_user_profile(user_info_df, repo_info_df, starring_df, today=TODAY)
    b = build_user_profile(user_info_df, repo_info_df, starring_df, today=TODAY)
    ra = sorted(map(str, a.select("user_id", "user_recent_repo_languages").collect()))
    rb = sorted(map(str, b.select("user_id", "user_recent_repo_languages").collect()))
    assert ra == rb


def test_repo_profile_filters(repo_profile, repo_info_df):
    rows = repo_profile.collect()
    assert len(rows) > 0
    for r in rows:
        assert 30 <= r.repo_stargazers_count <= 100000
    # junk-description repos must be gone
    texts = " ".join(r.repo_text for r in rows)
    assert "deprecated" not in texts
    # 7 id/raw + 9 boolean + 11 continuous + 2 categorical + 1 list + 1 text
    assert len(repo_profile.columns) == 31


def test_repo_profile_binning(repo_profile):
    langs = {r.repo_binned_language for r in repo_profile.collect()}
    assert "__other" in langs
