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


def test_quality_classifier_auc(spark):
    """Seeded end-to-end quality model (VERDICT r5 ask #5): real documents
    as positives vs single-token-gibberish negatives; the hashed-TF + LR
    composition must rank a deterministic holdout near-perfectly."""
    from pyspark.sql import functions as F

    from albedo_spark.io import load_table
    from albedo_spark.pipelines.quality_model import (
        score_quality,
        train_quality_model,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    good = docs.select("doc_id", "text", F.lit(1.0).alias("label"))
    bad = docs.select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_repeat(F.element_at(F.split("text", " "), 1), 40),
        ).alias("text"),
        F.lit(0.0).alias("label"),
    )
    labeled = good.unionByName(bad)
    train = labeled.where("doc_id % 5 != 0")
    test = labeled.where("doc_id % 5 = 0")
    model = train_quality_model(train, dim=64)
    scored = (
        score_quality(model, test, dim=64)
        .join(test.select("doc_id", "label"), "doc_id")
        .collect()
    )
    # rank-based AUC over the holdout
    ranked = sorted(scored, key=lambda r: (r.quality_prob, r.doc_id))
    pos_ranks = [i + 1 for i, r in enumerate(ranked) if r.label == 1.0]
    n_pos = len(pos_ranks)
    n_neg = len(ranked) - n_pos
    assert n_pos > 20 and n_neg > 20
    auc = (sum(pos_ranks) - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert auc >= 0.95, auc
    # determinism: no RNG in the path — retraining reproduces coefficients
    model2 = train_quality_model(train, dim=64)
    import numpy as np

    assert np.allclose(
        model.coefficients.toArray(), model2.coefficients.toArray()
    )
