"""ContentRecommender (M5) — the one architectural rewrite (SURVEY.md §7.4).

Reference: ``S/recommenders/ContentRecommender.scala:31-87`` runs per-user
Elasticsearch More-Like-This queries *from inside executors* (S9), seeded by
a per-user JDBC point query for recent starred repos (S8). Executor-side
network calls to external services are the anti-pattern we re-architect:

Spark-native design (pure DataFrame, one inverted-index join):
1. recent-k starred repos per user (W1 window — replaces the executor-side
   ``DBFunctions.selectUserStarredRepos`` offset query,
   ``S/closures/DBFunctions.scala:9-37``)
2. tokenize the repo corpus once; document-frequency → IDF weights
3. user query terms = tokens of the user's recent repos, top
   ``max_query_terms`` by IDF (mirrors ES MLT ``maxQueryTerms=50`` /
   ``minTermFreq=2`` semantics, ContentRecommender.scala:52-60)
4. inverted-index equi-join query terms ↔ repo tokens, score = Σ idf²
   (query-idf × doc-idf for binary tf) per (user, repo)
5. drop already-starred (left_anti), top-k per user (W1)

Every step is a shuffle-bounded join/agg — no per-row external calls, no
driver loops; scales with corpus token count, not |users|×|corpus|.
Metric parity with ES MLT is not expected; NDCG comparable-or-better is the
bar (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.topk import top_k_per_group
from albedo_spark.recommenders.base import Recommender


def tokenize_corpus(repo_text_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(repo_id, token) distinct pairs; lowercase word tokens, len ≥ 2
    (single-char tokens dropped as in the reference tokenizer,
    S/transformers/HanLPTokenizer.scala:42-47)."""
    return (
        repo_text_df.select(
            "repo_id",
            F.explode(
                F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w]+", " ")), " ")
            ).alias("token"),
        )
        .where(F.length("token") >= 2)
        .distinct()
    )


class ContentRecommender(Recommender):
    def __init__(
        self,
        starring_df: DataFrame | None = None,
        repo_text_df: DataFrame | None = None,
        recent_k: int = 10,
        max_query_terms: int = 50,
        min_doc_freq: int = 2,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.starring_df = starring_df
        self.repo_text_df = repo_text_df
        self.recent_k = recent_k
        self.max_query_terms = max_query_terms
        self.min_doc_freq = min_doc_freq

    source = "content"

    def recommend_for_users(self, user_df: DataFrame) -> DataFrame:
        user_col, item_col = self.getUserCol(), self.getItemCol()

        # lazy localCheckpoint, not persist: this method returns a lazy
        # frame and could never unpersist its own cache (the
        # line_boilerplate_dedup leak-fix discipline) — tokens is read
        # three times below (idf, query-term join, scoring join)
        tokens = tokenize_corpus(self.repo_text_df).localCheckpoint(eager=False)
        n_docs = self.repo_text_df.count()
        idf = (
            tokens.groupBy("token")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") >= self.min_doc_freq)
            .withColumn("idf", F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)))
        )

        # 1. per-user recent-k starred repos (only for requested users)
        recent = top_k_per_group(
            self.starring_df.join(user_df.select(user_col), user_col, "left_semi"),
            [user_col],
            [F.col("starred_at").desc(), F.col("repo_id").desc()],
            self.recent_k,
        )

        # 3. query terms: tokens of recent repos, top max_query_terms by idf
        query_terms = top_k_per_group(
            recent.select(user_col, "repo_id")
            .join(tokens, "repo_id")
            .select(user_col, "token")
            .distinct()
            .join(idf, "token"),
            [user_col],
            [F.col("idf").desc(), F.col("token").asc()],
            self.max_query_terms,
        )

        # 4. inverted-index join + Σ idf² scoring
        scored = (
            query_terms.join(tokens, "token")
            .groupBy(user_col, "repo_id")
            .agg(F.sum(F.col("idf") * F.col("idf")).alias("score"))
        )

        # 5. exclude already-starred, top-k
        seen = self.starring_df.select(user_col, "repo_id")
        fresh = scored.join(seen, [user_col, "repo_id"], "left_anti")
        out = top_k_per_group(
            fresh,
            [user_col],
            [F.col("score").desc(), F.col("repo_id").asc()],
            self.getTopK(),
        )
        return out.select(
            F.col(user_col),
            F.col("repo_id").alias(item_col),
            F.col("score").cast("double").alias(self.getScoreCol()),
            F.lit(self.source).alias(self.getSourceCol()),
        )
