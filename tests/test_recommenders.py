"""Recommender contract + behavior tests on the seeded albedo fixtures
(SURVEY.md §5 implication #3: end-to-end with pinned shapes)."""

import math

import pytest
from pyspark.sql import functions as F

from albedo_spark.evaluators import RankingEvaluator
from albedo_spark.evaluators.ranking import user_actual_items
from albedo_spark.recommenders import (
    ContentRecommender,
    CurationRecommender,
    PopularityRecommender,
)
from albedo_spark.recommenders.popularity import build_popular_repo_df, popularity_score
from albedo_spark.transformers import RankingMetricFormatter
from tests.conftest import CURATOR_IDS, FIXED_USER_ID


@pytest.fixture(scope="module")
def test_users(spark, user_ids):
    sample = sorted(user_ids)[:20] + [FIXED_USER_ID]
    return spark.createDataFrame([(u,) for u in set(sample)], "user_id int")


def _assert_contract(rec_df, n_users, top_k):
    assert rec_df.columns == ["user_id", "repo_id", "score", "source"]
    per_user = rec_df.groupBy("user_id").count().collect()
    assert len(per_user) <= n_users
    assert all(r["count"] <= top_k for r in per_user)


def test_popularity(spark, repo_info_df, test_users):
    rec = PopularityRecommender(
        popular_repo_df=build_popular_repo_df(repo_info_df), topK=10
    )
    out = rec.transform(test_users).cache()
    _assert_contract(out, test_users.count(), 10)
    # every user gets the same items; scores deterministic
    n_items = out.select("repo_id").distinct().count()
    assert n_items <= 10
    # score formula spot check (PopularityRecommender.scala:26-30)
    row = (
        build_popular_repo_df(repo_info_df)
        .limit(1)
        .withColumn(
            "s", popularity_score(F.col("repo_stargazers_count"), F.col("repo_created_at"))
        )
        .collect()[0]
    )
    expected = round(math.log10(row.repo_stargazers_count), 3) + (
        row.repo_created_at.timestamp() / (60 * 60 * 24 * 30 * 12) / 5.0
    )
    assert row.s == pytest.approx(expected, rel=1e-9)


def test_curation(spark, starring_df, test_users):
    rec = CurationRecommender(starring_df=starring_df, topK=8)
    out = rec.transform(test_users).cache()
    _assert_contract(out, test_users.count(), 8)
    # curated items must be items some curator starred
    curated = {r.repo_id for r in out.select("repo_id").distinct().collect()}
    curator_items = {
        r.repo_id
        for r in starring_df.where(F.col("user_id").isin(list(CURATOR_IDS)))
        .select("repo_id").distinct().collect()
    }
    assert curated <= curator_items


def test_content(spark, starring_df, repo_info_df, test_users):
    repo_text = repo_info_df.select(
        "repo_id",
        F.concat_ws(
            " ", "repo_name", F.coalesce("repo_description", F.lit("")), "repo_topics"
        ).alias("text"),
    )
    rec = ContentRecommender(
        starring_df=starring_df, repo_text_df=repo_text, topK=10, min_doc_freq=2
    )
    out = rec.transform(test_users).cache()
    _assert_contract(out, test_users.count(), 10)
    # no recommended item may already be starred by that user (left_anti step)
    overlap = out.join(
        starring_df.select("user_id", "repo_id"), ["user_id", "repo_id"], "inner"
    ).count()
    assert overlap == 0


def test_rejects_bad_schema(spark, repo_info_df):
    rec = PopularityRecommender(popular_repo_df=build_popular_repo_df(repo_info_df))
    bad = spark.createDataFrame([("a",)], "user_id string")
    with pytest.raises(ValueError, match="integral"):
        rec.transform(bad)


def test_end_to_end_ndcg(spark, repo_info_df, starring_df, test_users):
    """The §7.6 minimum slice: popularity recs → formatter → NDCG@30."""
    rec = PopularityRecommender(
        popular_repo_df=build_popular_repo_df(repo_info_df), topK=30
    )
    recs = rec.transform(test_users)
    pred = RankingMetricFormatter(
        sourceType="als", predictionCol="score", topK=30
    ).transform(recs)
    actual = user_actual_items(starring_df, k=30)
    joined = pred.join(actual, "user_id", "inner")
    ndcg = RankingEvaluator(metricName="ndcg@k", k=30).evaluate(joined)
    assert 0.0 <= ndcg <= 1.0


def test_als_seeded_determinism_and_ndcg_floor(spark, starring_df, test_users):
    """VERDICT r1 #7: strengthen the rows-only q35 — (a) seeded ALS must
    produce IDENTICAL per-user rank lists across two independent fits
    (rank order is deterministic under a fixed seed even though raw float
    scores may vary across BLAS paths — the q35 shape contract), and
    (b) recommendations must beat a quality floor: NDCG@10 against each
    user's actually-starred items well above random on the seeded fixture."""
    from albedo_spark.recommenders import ALSRecommender
    from albedo_spark.recommenders.als import train_als

    def fit_and_rank():
        model = train_als(starring_df, rank=8, maxIter=5, regParam=0.1, alpha=10.0)
        rec = ALSRecommender(als_model=model, topK=10).transform(test_users)
        w = RankingMetricFormatter(
            sourceType="als", predictionCol="score", topK=10
        ).transform(rec)
        return {r.user_id: tuple(r.pred_items) for r in w.collect()}

    lists_a = fit_and_rank()
    lists_b = fit_and_rank()
    assert lists_a and lists_a == lists_b  # stable rank lists, run to run

    preds = spark.createDataFrame(
        [(u, list(items)) for u, items in lists_a.items()],
        "user_id int, pred_items array<int>",
    )
    actual = user_actual_items(starring_df, k=10)
    joined = preds.join(actual, "user_id")
    ndcg = RankingEvaluator(metricName="ndcg@k", k=10).evaluate(joined)
    # ~300 repos in the fixture: random top-10 lists score < 0.05 here;
    # trained ALS on the seeded tastes must clear a real margin
    assert ndcg > 0.15, f"NDCG@10 {ndcg:.4f} below floor"


def test_train_als_sets_checkpoint_dir(spark, starring_df, tmp_path):
    """S12: train_als(checkpoint_dir=...) must actually install the
    checkpoint dir on the SparkContext (ALSRecommenderBuilder.scala:36) —
    it was a docstring promise before."""
    from albedo_spark.recommenders.als import train_als

    ckpt = str(tmp_path / "als_ckpt")
    model = train_als(
        starring_df, checkpoint_dir=ckpt, rank=4, maxIter=3,
        checkpointInterval=1,
    )
    assert model.rank == 4
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getCheckpointDir().isDefined()
    assert "als_ckpt" in jsc.getCheckpointDir().get()


def test_serve_topk_exact_vs_brute_force(spark):
    """q148's serving contract: serve_topk on integer factors must equal a
    driver-side brute-force dot-product ranking exactly — scores AND the
    (score desc, item asc) tie-break — and emit no CartesianProduct (the
    item side must broadcast)."""
    from albedo_spark.queries import _ALS_ITEM_FACTORS, _ALS_USER_FACTORS
    from albedo_spark.recommenders.als import serve_topk

    uf = spark.createDataFrame(_ALS_USER_FACTORS, "user_id long, features array<long>")
    itf = spark.createDataFrame(_ALS_ITEM_FACTORS, "repo_id long, features array<long>")
    out = serve_topk(uf, itf, k=5)
    got = {(r.user_id, r.rank): (r.repo_id, r.score) for r in out.collect()}

    expect = {}
    for u, ufs in _ALS_USER_FACTORS:
        scored = [
            (sum(a * b for a, b in zip(ufs, ifs)), i) for i, ifs in _ALS_ITEM_FACTORS
        ]
        ranked = sorted(scored, key=lambda t: (-t[0], t[1]))[:5]
        for rank, (s, i) in enumerate(ranked, 1):
            expect[(u, rank)] = (i, s)
    assert got == expect

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
