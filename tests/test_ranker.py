"""End-to-end LR ranker (E3, downsized params) + Word2Vec corpus +
tokenizer + ALS train on the seeded fixtures — the reference's full DAG."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from albedo_spark.pipelines import build_repo_profile, build_user_profile
from albedo_spark.pipelines.ranker import (
    balance_starring,
    build_feature_pipeline,
    build_model_pipeline,
    cast_booleans,
    evaluate_auc,
    rank_candidates,
    reduce_starring,
)
from albedo_spark.pipelines.word2vec_corpus import build_corpus, train_word2vec
from albedo_spark.recommenders import ALSRecommender, PopularityRecommender
from albedo_spark.recommenders.als import train_als
from albedo_spark.recommenders.popularity import build_popular_repo_df
from albedo_spark.transformers.tokenizer import NativeTokenizer

TODAY = dt.date(2017, 9, 1)


def test_tokenizer(spark):
    df = spark.createDataFrame(
        [("I love C++ and c# and R, 機器學習 rocks",)], "text string"
    )
    out = NativeTokenizer(inputCol="text", outputCol="words").transform(df)
    words = out.collect()[0].words
    assert "c++" in words and "c#" in words and "r" in words
    assert "機" in words  # CJK char unigrams
    assert "i" not in words  # 1-char non-CJK dropped (except c/r)


@pytest.fixture(scope="module")
def profiles(user_info_df, repo_info_df, starring_df):
    up = build_user_profile(
        user_info_df, repo_info_df, starring_df, today=TODAY,
        company_bin_threshold=2, location_bin_threshold=5,
    ).cache()
    rp = build_repo_profile(
        repo_info_df, starring_df, today=TODAY, language_bin_threshold=5
    ).cache()
    return up, rp


def test_word2vec_corpus(profiles):
    up, rp = profiles
    corpus = build_corpus(up, rp)
    assert corpus.columns == ["text", "words"]
    model = train_word2vec(corpus, vectorSize=8, minCount=2, maxIter=2)
    vecs = model.getVectors()
    assert vecs.count() > 0


def test_als_trains(starring_df):
    model = train_als(starring_df, rank=4, maxIter=2)
    assert model.rank == 4
    recs = ALSRecommender(als_model=model, topK=5).transform(
        starring_df.select("user_id").distinct().limit(5)
    )
    assert recs.count() <= 25


def test_full_ranker_flow(spark, starring_df, repo_info_df, profiles):
    up, rp = profiles
    reduced = reduce_starring(starring_df, max_starred_repos_count=100)
    popular = [
        r.repo_id
        for r in build_popular_repo_df(repo_info_df).limit(30).collect()
    ]
    balanced = balance_starring(reduced, popular, ratio=1.0)
    dataset = cast_booleans(
        balanced.join(up, "user_id").join(rp, "repo_id")
    ).cache()
    assert dataset.count() > 0

    pipeline = build_feature_pipeline(min_df=1.0)
    feature_model = pipeline.fit(dataset)
    featured = feature_model.transform(dataset).cache()
    assert "features" in featured.columns

    train, test = featured.randomSplit([0.8, 0.2], seed=42)
    model = build_model_pipeline(today=TODAY, maxIter=10).fit(train)
    auc = evaluate_auc(model, test)
    assert 0.4 <= auc <= 1.0  # sanity: trained model, non-degenerate

    users = dataset.select("user_id").distinct().limit(5)
    pop_rec = PopularityRecommender(
        popular_repo_df=build_popular_repo_df(repo_info_df), topK=10
    )
    ranked = rank_candidates(
        [pop_rec.transform(users)], up, rp, feature_model, model, top_k=5
    )
    assert ranked.groupBy("user_id").count().agg(F.max("count")).collect()[0][0] <= 5


def test_fit_feature_pipeline_matches_sequential(
    spark, starring_df, repo_info_df, profiles
):
    """fit_feature_pipeline (overlapped estimator fits) must return the
    same fitted pipeline as build_feature_pipeline().fit(): same stage
    order, exact-equal indexer labels and encoder sizes (deterministic
    since Spark 3's alphabetic tie-break), and per-row term→count maps
    for every CountVectorizer block. The CV VOCABULARY ORDER is compared
    as a set: stock CountVectorizer breaks frequency ties in partition-
    arrival order and is nondeterministic run-to-run even for two
    back-to-back SEQUENTIAL fits on the same cached frame (measured),
    so order-equality was never a property of this pipeline."""
    from pyspark.ml.feature import (
        CountVectorizerModel,
        OneHotEncoderModel,
        StringIndexerModel,
    )
    from pyspark.ml.functions import vector_to_array

    from albedo_spark.pipelines.ranker import fit_feature_pipeline

    up, rp = profiles
    reduced = reduce_starring(starring_df, max_starred_repos_count=100)
    popular = [
        r.repo_id for r in build_popular_repo_df(repo_info_df).limit(30).collect()
    ]
    balanced = balance_starring(reduced, popular, ratio=1.0)
    dataset = cast_booleans(balanced.join(up, "user_id").join(rp, "repo_id")).cache()

    seq = build_feature_pipeline(min_df=1.0).fit(dataset)
    par = fit_feature_pipeline(dataset, min_df=1.0)

    assert len(seq.stages) == len(par.stages)
    cv_pairs = []
    for s, p in zip(seq.stages, par.stages):
        assert type(s) is type(p)
        if isinstance(s, StringIndexerModel):
            assert s.labelsArray == p.labelsArray
        elif isinstance(s, OneHotEncoderModel):
            assert s.categorySizes == p.categorySizes
        elif isinstance(s, CountVectorizerModel):
            assert sorted(s.vocabulary) == sorted(p.vocabulary)
            cv_pairs.append((s, p))
    assert len(cv_pairs) == 3

    # Per-row feature CONTENT equality for each vectorizer block: map each
    # model's indices back through its own vocabulary so a tie-order
    # permutation (the stock nondeterminism above) cannot mask a real
    # difference in counts.
    def term_counts(model, cv_model):
        out_col = cv_model.getOutputCol()
        rows = (
            model.transform(dataset)
            .select(
                "user_id", "repo_id", vector_to_array(F.col(out_col)).alias("v")
            )
            .collect()
        )
        vocab = cv_model.vocabulary
        return {
            (r.user_id, r.repo_id): {
                vocab[i]: x for i, x in enumerate(r.v) if x != 0.0
            }
            for r in rows
        }

    for s_cv, p_cv in cv_pairs:
        assert term_counts(seq, s_cv) == term_counts(par, p_cv)


def test_ranker_cv_default_weight_cols_resolve(spark):
    """ranker_cv's default grid must name columns that the repo's own
    weight_sql() emits (the CV reference used recentStarredWeight where the
    ranker's weightSQL used positiveStarredWeight — the repo standardizes on
    the latter). Exercises fit end-to-end over all four weight columns."""
    from pyspark.ml.feature import SQLTransformer
    from pyspark.ml.linalg import Vectors

    from albedo_spark.pipelines.cv import LR_CV_WEIGHT_COLS, ranker_cv
    from albedo_spark.pipelines.ranker import weight_sql

    rows = []
    for i in range(80):
        label = float(i % 2)
        rows.append(
            (
                Vectors.dense([label + 0.1 * ((i * 7) % 5), 1.0 - label]),
                label,
                dt.datetime(2017, 5, 1) + dt.timedelta(days=i),
                dt.datetime(2016, 1, 1) + dt.timedelta(days=i),
            )
        )
    df = spark.createDataFrame(
        rows, ["features", "starring", "starred_at", "repo_created_at"]
    )
    featured = SQLTransformer(statement=weight_sql(TODAY)).transform(df)
    assert set(LR_CV_WEIGHT_COLS) <= set(featured.columns)

    model = ranker_cv(featured, num_folds=2, maxIter=5)
    assert len(model.avgMetrics) == len(LR_CV_WEIGHT_COLS)
    assert model.bestModel.getWeightCol() in LR_CV_WEIGHT_COLS


def test_tokenizer_jieba_mode_segments_cjk_runs(spark, monkeypatch):
    """cjkSegmentation='jieba' routes CJK runs through a dictionary
    segmenter in an Arrow-batched pandas_udf while non-CJK tokens keep the
    native rules. Uses the closure-captured segmenter hook with a
    deterministic fake (jieba itself is an optional dep not present here);
    the hook crosses the Python-worker boundary via cloudpickle, which
    sys.modules patching would not."""
    from albedo_spark.transformers import tokenizer as tok_mod

    # fake dictionary segmenter: splits a CJK run into 2-char words
    monkeypatch.setattr(
        tok_mod, "_SEGMENT_FACTORY",
        lambda: (lambda run: [run[i:i + 2] for i in range(0, len(run), 2)]),
    )
    df = spark.createDataFrame(
        [("I love C++ and 機器學習 rocks",)], "text string"
    )
    out = tok_mod.NativeTokenizer(
        inputCol="text", outputCol="words", cjkSegmentation="jieba"
    ).transform(df)
    words = out.collect()[0].words
    assert "c++" in words and "love" in words and "rocks" in words
    assert "機器" in words and "學習" in words      # segmented pairs
    assert "機" not in words                        # NOT character unigrams
    assert "i" not in words                         # 1-char non-CJK dropped


def test_tokenizer_jieba_mode_without_jieba_raises(spark):
    import pytest as _pytest

    from albedo_spark.transformers import tokenizer as tok_mod

    if tok_mod._SEGMENT_FACTORY is not None:  # pragma: no cover
        _pytest.skip("segmenter hook active")
    try:
        import jieba  # noqa: F401
        _pytest.skip("real jieba installed")
    except ImportError:
        pass
    df = spark.createDataFrame([("text",)], "text string")
    with _pytest.raises(NotImplementedError, match="jieba"):
        tok_mod.NativeTokenizer(cjkSegmentation="jieba").transform(df)


def test_ranker_cv_end_to_end_on_fixture(spark, starring_df, repo_info_df, profiles):
    """2-fold CV through the full build_model_pipeline DAG on the seeded
    fixture (VERDICT r3 ask #8): feature pipeline -> CrossValidator over
    the weight-column grid -> best_params_report ranks the schemes."""
    from albedo_spark.pipelines.cv import (
        LR_CV_WEIGHT_COLS,
        best_params_report,
        ranker_cv_full,
    )

    up, rp = profiles
    reduced = reduce_starring(starring_df, max_starred_repos_count=100)
    popular = [
        r.repo_id for r in build_popular_repo_df(repo_info_df).limit(30).collect()
    ]
    balanced = balance_starring(reduced, popular, ratio=1.0)
    dataset = cast_booleans(balanced.join(up, "user_id").join(rp, "repo_id")).cache()
    featured = (
        build_feature_pipeline(min_df=1.0).fit(dataset).transform(dataset).cache()
    )

    cols = LR_CV_WEIGHT_COLS[:2]  # 2-point grid keeps the test ~a minute
    cv_model = ranker_cv_full(featured, today=TODAY, weight_cols=cols,
                              num_folds=2, maxIter=5)
    report = best_params_report(cv_model)
    assert len(report) == len(cols)
    assert all(0.0 <= m <= 1.0 for _, m in report)
    metrics = [m for _, m in report]
    assert metrics == sorted(metrics, reverse=True)  # best first
    assert report[0][0]["weightCol"] in cols
    # the winning model is the full pipeline: transforms raw featured rows
    assert "rawPrediction" in cv_model.bestModel.transform(featured).columns
