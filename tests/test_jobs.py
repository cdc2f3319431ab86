"""CLI job smoke: each entry point runs end-to-end on the synthetic
fixtures and returns a finite NDCG (the §7.6 minimum-slice contract)."""

import math

from albedo_spark.jobs import als, curation, popularity


def test_popularity_job(spark):
    ndcg = popularity.main(["--eval-sample", "20"])
    assert math.isfinite(ndcg) and 0.0 <= ndcg <= 1.0


def test_curation_job(spark):
    ndcg = curation.main(["--eval-sample", "20"])
    assert math.isfinite(ndcg) and 0.0 <= ndcg <= 1.0


def test_als_job_fast(spark):
    ndcg = als.main(["--fast", "--eval-sample", "20"])
    assert math.isfinite(ndcg) and ndcg > 0.0


def test_profiles_job(spark, tmp_path):
    from albedo_spark.jobs import profiles

    n_up, n_rp = profiles.main(["--out", str(tmp_path / "prof")])
    assert n_up > 0 and n_rp > 0
    assert spark.read.parquet(str(tmp_path / "prof/user_profile")).count() == n_up
