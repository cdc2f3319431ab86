from albedo_spark.evaluators.ranking import RankingEvaluator, ranking_metrics_df

__all__ = ["RankingEvaluator", "ranking_metrics_df"]
