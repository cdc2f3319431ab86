"""LogisticRegressionRanker (E3) — the full feature + model pipeline.

Reference: ``S/LogisticRegressionRanker.scala``. Stages and params kept
1:1 where they are semantic; Spark-first replacements where the reference
fought the framework:

- ``SimpleVectorAssembler`` (M13, a metadata-stripped clone of Spark's
  assembler) → stock ``VectorAssembler(handleInvalid='keep')``.
- HanLP tokenizer → ``NativeTokenizer`` (regexp-based, M9 rebuild).
- The driver-collected popular-repo set for negative sampling (A7/U3) →
  the NegativeBalancer's array-literal form (bounded: topN popular repos).
- The weight SQLTransformer keeps the reference's exact SQL statement
  (``:316-325``) — the engine's one SQL-string entry point — but with
  ``current_date()`` replaced by a pinned date parameter for determinism.

LR params (``:330-337``): maxIter=300, regParam=0.7, elasticNet=0,
standardization, weightCol=positive_starred_weight.
"""

from __future__ import annotations

import datetime as dt

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import (
    CountVectorizer,
    OneHotEncoder,
    SQLTransformer,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.transformers import NegativeBalancer, UserRepoTransformer

BOOLEAN_COLS = [
    "user_has_null", "user_knows_web", "user_knows_backend",
    "user_knows_frontend", "user_knows_mobile", "user_knows_devops",
    "user_knows_data", "user_knows_recsys", "user_is_lead", "user_is_scholar",
    "user_is_freelancer", "user_is_junior", "user_is_pm", "user_has_blog",
    "repo_has_issues", "repo_has_projects", "repo_has_downloads",
    "repo_has_wiki", "repo_has_pages", "repo_has_null",
    "repo_has_activities_in_60days", "repo_has_homepage", "repo_is_vinta_starred",
]
CONTINUOUS_COLS = [
    "user_public_repos_count", "user_public_gists_count", "user_followers_count",
    "user_following_count", "user_followers_following_ratio",
    "user_days_between_created_at_today", "user_days_between_updated_at_today",
    "user_starred_repos_count", "user_avg_daily_starred_repos_count",
    "repo_size", "repo_stargazers_count", "repo_forks_count",
    "repo_subscribers_count", "repo_open_issues_count",
    "repo_days_between_created_at_today", "repo_days_between_updated_at_today",
    "repo_days_between_pushed_at_today", "repo_subscribers_stargazers_ratio",
    "repo_forks_stargazers_ratio", "repo_open_issues_stargazers_ratio",
    "repo_language_index_in_user_recent_repo_languages",
    "repo_language_count_in_user_recent_repo_languages",
]
CATEGORICAL_COLS = [
    "user_account_type", "user_binned_company", "user_binned_location",
    "repo_owner_type", "repo_binned_language",
]
LIST_COLS = ["user_recent_repo_languages", "user_recent_repo_topics",
             "repo_clean_topics"]

REFERENCE_LR_PARAMS = dict(
    maxIter=300, regParam=0.7, elasticNetParam=0.0, standardization=True,
    labelCol="starring", featuresCol="features",
    weightCol="positive_starred_weight",
)


def reduce_starring(starring: DataFrame, max_starred_repos_count: int = 4000) -> DataFrame:
    """Drop mega-stargazers (``:137-149``): count join + ≤ filter."""
    counts = starring.groupBy("user_id").agg(
        F.count("*").alias("user_starred_repos_count")
    )
    return (
        starring.join(counts, "user_id")
        .where(F.col("user_starred_repos_count") <= max_starred_repos_count)
        .select("user_id", "repo_id", "starred_at", "starring")
    )


def build_feature_pipeline(
    als_model=None,
    categorical_cols: list[str] | None = None,
    list_cols: list[str] | None = None,
    boolean_cols: list[str] | None = None,
    continuous_cols: list[str] | None = None,
    min_df: float = 10.0,
    index_ids: bool = False,
) -> Pipeline:
    """The 20-stage feature Pipeline (``:160-240``).

    ``index_ids=True`` adds user_id/repo_id as one-hot categoricals like the
    reference (``:155-156``) — enormous cardinality at scale; off by default.
    Text→Word2Vec stages are appended by the caller when a Word2VecModel is
    available (they need a fitted model, ``:208-216``).
    """
    categorical = list(categorical_cols or CATEGORICAL_COLS)
    lists = list(list_cols or LIST_COLS)
    booleans = list(boolean_cols or BOOLEAN_COLS)
    continuous = list(continuous_cols or CONTINUOUS_COLS)
    if index_ids:
        categorical += ["user_id", "repo_id"]

    stages = [UserRepoTransformer()]
    if als_model is not None:
        stages.append(als_model)
        continuous = continuous + ["als_score"]

    for c in categorical:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}__idx", handleInvalid="keep")
        )
        stages.append(
            OneHotEncoder(inputCol=f"{c}__idx", outputCol=f"{c}__ohe", dropLast=False)
        )
    for c in lists:
        stages.append(
            CountVectorizer(inputCol=c, outputCol=f"{c}__cv", minDF=min_df, minTF=1.0)
        )

    assembled = (
        [F"{c}" for c in booleans]
        + continuous
        + [f"{c}__ohe" for c in categorical]
        + [f"{c}__cv" for c in lists]
    )
    # stock assembler replaces SimpleVectorAssembler (M13): booleans need an
    # explicit double cast, which the caller's prepare step does.
    stages.append(
        VectorAssembler(inputCols=assembled, outputCol="features", handleInvalid="keep")
    )
    return Pipeline(stages=stages)


def fit_feature_pipeline(
    dataset: DataFrame,
    als_model=None,
    categorical_cols: list[str] | None = None,
    list_cols: list[str] | None = None,
    boolean_cols: list[str] | None = None,
    continuous_cols: list[str] | None = None,
    min_df: float = 10.0,
    index_ids: bool = False,
    max_concurrent: int = 4,
) -> PipelineModel:
    """``build_feature_pipeline(...).fit(dataset)`` with the independent
    estimator fits OVERLAPPED — the same fitted ``PipelineModel`` (same
    stages, same order, same indexer labels / encoder sizes / vectorizer
    term sets; stock CountVectorizer's frequency-TIE order is
    nondeterministic run-to-run even for sequential fits, so vocabulary
    order equality was never a pipeline property), less wall time.

    Why this is safe: every estimator in the feature pipeline reads ONE
    input column that no earlier stage writes (StringIndexer reads the raw
    categorical, its OneHotEncoder reads only the ``__idx`` column its own
    indexer emits, CountVectorizer reads the raw list column), so
    ``Pipeline.fit``'s fit-stage-k-on-stages-0..k-1-transformed protocol
    degenerates to independent jobs over the same frame. Each fit is a
    small aggregation whose tail leaves most cores idle; submitting them
    from a thread pool back-fills the tails (2-3 jobs in flight is the
    sweet spot). Indexer→encoder pairs stay sequential WITHIN a thread
    (the encoder fit needs its indexer's model). Equivalence is pinned by
    ``tests/test_ranker.py::test_fit_feature_pipeline_matches_sequential``.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml import Transformer

    stages = build_feature_pipeline(
        als_model=als_model,
        categorical_cols=categorical_cols,
        list_cols=list_cols,
        boolean_cols=boolean_cols,
        continuous_cols=continuous_cols,
        min_df=min_df,
        index_ids=index_ids,
    ).getStages()

    fitted: list = [None] * len(stages)
    # Leading pure transformers (UserRepoTransformer, optional ALS model)
    # pass through unfitted but their transforms feed every fit, exactly
    # as in Pipeline.fit.
    base = dataset
    k = 0
    while k < len(stages) and isinstance(stages[k], Transformer):
        fitted[k] = stages[k]
        base = stages[k].transform(base)
        k += 1

    slots: list[tuple[int, bool]] = []  # (stage index, paired-with-encoder)
    i = k
    while i < len(stages):
        st = stages[i]
        if isinstance(st, Transformer):  # e.g. the trailing VectorAssembler
            fitted[i] = st
            i += 1
        elif isinstance(st, StringIndexer):
            slots.append((i, True))
            i += 2
        else:
            slots.append((i, False))
            i += 1

    def _fit(slot: tuple[int, bool]):
        j, paired = slot
        if paired:
            idx_model = stages[j].fit(base)
            return j, [idx_model, stages[j + 1].fit(idx_model.transform(base))]
        return j, [stages[j].fit(base)]

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        for j, models in pool.map(_fit, slots):
            for off, m in enumerate(models):
                fitted[j + off] = m

    return PipelineModel(fitted)


def cast_booleans(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """VectorAssembler needs numerics; the reference's custom assembler
    casted booleans inline (SimpleVectorAssembler.scala:59).

    Also maps empty-string categorical values to '__empty': stock
    VectorAssembler builds ML attribute metadata from OHE category names and
    rejects empty names ('Cannot have an empty string for name') — the very
    metadata fight that made the reference clone its own assembler (M13).
    Sanitizing the values is the Spark-first fix; the sentinel matches the
    clean-UDF convention.
    """
    # ONE select, not a withColumn per column (r16): each withColumn
    # forces a full analyzer pass over the (wide, multi-join) frame —
    # ~10 sequential passes of pure driver time. Same replacement
    # semantics, single analysis at the first action.
    bools = {c for c in (cols or BOOLEAN_COLS) if c in df.columns}
    cats = {
        c for c in CATEGORICAL_COLS + ["repo_language"] if c in df.columns
    } - bools
    out = []
    for c in df.columns:
        if c in bools:
            out.append(F.col(c).cast("double").alias(c))
        elif c in cats:
            out.append(
                F.coalesce(F.nullif(F.col(c), F.lit("")), F.lit("__empty")).alias(c)
            )
        else:
            out.append(F.col(c))
    return df.select(*out)


def weight_sql(today: dt.date | None = None) -> str:
    """The reference's SQLTransformer statement (``:316-325``) — its only
    SQL-string entry point — with current_date() pinned when ``today`` given."""
    today_expr = f"DATE '{today.isoformat()}'" if today else "current_date()"
    return f"""
    SELECT *,
           1.0 AS default_weight,
           IF (starring = 1.0, 0.9, 0.1) AS positive_weight,
           IF (starring = 1.0 AND datediff({today_expr}, starred_at) <= 365, 0.9, 0.1) AS positive_starred_weight,
           IF (starring = 1.0 AND datediff({today_expr}, repo_created_at) <= 730, 0.9, 0.1) AS positive_created_weight,
           IF (starring = 1.0, ROUND(CAST(repo_created_at AS INT) / (60 * 60 * 24 * 7), 0), 1.0) AS positive_created_week_weight
    FROM __THIS__
    """


def build_model_pipeline(today: dt.date | None = None, **lr_overrides) -> Pipeline:
    params = {**REFERENCE_LR_PARAMS, **lr_overrides}
    return Pipeline(
        stages=[
            SQLTransformer(statement=weight_sql(today)),
            LogisticRegression(**params),
        ]
    )


def balance_starring(
    reduced_starring: DataFrame, popular_repo_ids: list[int], ratio: float = 1.0
) -> DataFrame:
    nb = NegativeBalancer(
        popular_items=popular_repo_ids, negativePositiveRatio=ratio
    )
    return nb.transform(reduced_starring)


def evaluate_auc(model: PipelineModel, test_df: DataFrame) -> float:
    evaluator = BinaryClassificationEvaluator(
        metricName="areaUnderROC", rawPredictionCol="rawPrediction",
        labelCol="starring",
    )
    return evaluator.evaluate(model.transform(test_df))


def rank_candidates(
    candidate_dfs: list[DataFrame],
    user_profile: DataFrame,
    repo_profile: DataFrame,
    feature_model: PipelineModel,
    model: PipelineModel,
    top_k: int = 30,
) -> DataFrame:
    """Serving flow (``:397-426``): union candidate sources → distinct →
    re-join profiles → feature + model pipelines → per-user top-k by
    P(star)."""
    from functools import reduce

    from pyspark.ml.functions import vector_to_array

    from albedo_spark.operators.topk import top_k_per_group

    candidates = (
        reduce(lambda a, b: a.unionByName(b), [
            df.select("user_id", "repo_id") for df in candidate_dfs
        ])
        .distinct()
        .withColumn("starring", F.lit(0.0))
        .withColumn("starred_at", F.current_timestamp())
    )
    featured = feature_model.transform(
        cast_booleans(
            candidates.join(user_profile, "user_id").join(repo_profile, "repo_id")
        )
    )
    scored = model.transform(featured).withColumn(
        "p1", vector_to_array(F.col("probability")).getItem(1)
    )
    return top_k_per_group(
        scored.select("user_id", "repo_id", "p1"),
        ["user_id"],
        [F.col("p1").desc(), F.col("repo_id").asc()],
        top_k,
    )
