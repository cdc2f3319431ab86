"""Model-based document quality scoring (fasttext/CCNet-style).

The one standard pre-training hygiene stage that was heuristic-only until
round 6 (q79's checks are declarative rules; q19/q22 scores are closed
formulas): a LINEAR classifier over hashed bag-of-words features scoring
how "reference-like" each document reads — the public CCNet recipe
(fasttext trained on Wikipedia-vs-crawl) re-expressed Spark-first.

Composition of two already-gated components, nothing novel to trust:
``textstats.hashed_tf_features`` (q85 — vocabulary-free hashing trick, no
fit pass, portable md5 bucketing) pivoted into ``pyspark.ml`` vectors
JVM-side (map_from_entries + array_to_vector — no Python UDF), then stock
``LogisticRegression`` (the same estimator the ranker pipeline exercises;
cf. reference LogisticRegressionRanker, S/jobs/.../Ranker.scala via
SURVEY §2 M-components).

At 100 TB: featurization is one hash aggregate per (doc, bucket) plus a
bounded per-doc pivot (≤ dim rows per group); LR training runs on a
SAMPLE (labels are scarce by nature — CCNet trains on ~millions of rows),
scoring is a pure projection of the broadcast coefficient vector over
the full corpus. Nothing here shuffles the corpus more than q85 already
does.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.textstats import hashed_tf_features


def hashed_tf_vectors(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, features) — the q85 long-format hashed-TF pivoted into a dense
    ``ml`` vector, all JVM-side: per-doc map of (bucket → weight), then a
    ``transform`` over the bucket range + ``array_to_vector``. Weights are
    the q85 integerized L2-normalized counts scaled back to [0, 1]."""
    tf = hashed_tf_features(docs, dim=dim, id_col=id_col, text_col=text_col)
    per_doc = tf.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("dim_idx", "weight_x1m"))
        ).alias("_m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("long")), F.lit(0)
        ).cast("double")
        / F.lit(1_000_000.0),
    )
    return per_doc.select(F.col(id_col), array_to_vector(arr).alias("features"))


def train_quality_model(
    labeled: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> LogisticRegressionModel:
    """Fit the quality classifier on (text, label∈{0.0, 1.0}) rows.
    Deterministic: L-BFGS from a zero start on deterministic features —
    no RNG in the path, so retrains reproduce coefficients."""
    data = hashed_tf_vectors(labeled, dim, id_col, text_col).join(
        labeled.select(id_col, label_col), id_col
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return lr.fit(data)


def score_quality(
    model: LogisticRegressionModel,
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, quality_prob) — P(label=1) per document. The model is a
    broadcast coefficient vector; scoring adds no shuffle beyond the q85
    featurization itself."""
    feats = hashed_tf_vectors(docs, dim, id_col, text_col)
    scored = model.transform(feats)
    return scored.select(
        F.col(id_col),
        F.element_at(vector_to_array("probability"), 2).alias("quality_prob"),
    )


def weak_quality_labels(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frac: float = 0.25,
) -> DataFrame:
    """Bootstrap labels from the heuristic score when no human labels
    exist (the corpus-CLI path): top ``frac`` quantile of
    ``quality_score_x10k`` → 1.0, bottom ``frac`` → 0.0, middle dropped.
    Exact heuristic quantiles via two percentile aggregates (two scalars
    to the driver — swap percentile_approx at 100 TB, same plan)."""
    from albedo_spark.operators.textstats import quality_score_x10k

    scored = docs.select(
        F.col(id_col), F.col(text_col),
        quality_score_x10k(F.col(text_col)).alias("_q"),
    )
    lo, hi = scored.agg(
        F.expr(f"percentile(_q, {frac})"),
        F.expr(f"percentile(_q, {1 - frac})"),
    ).collect()[0]
    return scored.where((F.col("_q") <= lo) | (F.col("_q") >= hi)).select(
        id_col,
        text_col,
        F.when(F.col("_q") >= hi, F.lit(1.0)).otherwise(F.lit(0.0)).alias("label"),
    )
