"""Word2VecCorpusBuilder — reference ``S/Word2VecCorpusBuilder.scala``.

Corpus = user text (clean bio + recent repo descriptions) ∪ repo text
(owner/name/language/description), positionally unioned in the reference
(U1 — we use unionByName on a single-column frame), tokenized, then
Word2Vec (reference params: vectorSize=200, windowSize=5, minCount=10,
maxIter=30, ``:74-83``).
"""

from __future__ import annotations

from pyspark.ml.feature import Word2Vec, Word2VecModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.transformers.tokenizer import NativeTokenizer

REFERENCE_W2V_PARAMS = dict(
    vectorSize=200, windowSize=5, minCount=10, maxIter=30, seed=42
)


def build_corpus(user_profile: DataFrame, repo_profile: DataFrame) -> DataFrame:
    user_text = user_profile.select(
        F.concat_ws(
            " ", "user_clean_bio", "user_recent_repo_descriptions"
        ).alias("text")
    )
    repo_text = repo_profile.select(F.col("repo_text").alias("text"))
    corpus = user_text.unionByName(repo_text).where(F.trim("text") != "")
    return NativeTokenizer(
        inputCol="text", outputCol="words", shouldRemoveStopWords=True
    ).transform(corpus)


def train_word2vec(corpus: DataFrame, **overrides) -> Word2VecModel:
    params = {**REFERENCE_W2V_PARAMS, **overrides}
    w2v = Word2Vec(inputCol="words", outputCol="vector", **params)
    return w2v.fit(corpus)
