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


def test_jobs_data_dir_roundtrip(spark, tmp_path):
    # jobs consume parquet tables via --data-dir exactly as generated
    from albedo_spark.fixtures import generate_dataset
    from albedo_spark.jobs import popularity

    out = str(tmp_path / "tables")
    for name, df in generate_dataset(spark, n_users=60, n_repos=150).items():
        df.write.mode("overwrite").parquet(f"{out}/{name}")
    ndcg = popularity.main(["--data-dir", out, "--eval-sample", "15"])
    assert 0.0 <= ndcg <= 1.0
