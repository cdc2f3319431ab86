"""UserRepoTransformer (M8): user×repo cross features.

Reference: ``S/transformers/UserRepoTransformer.scala:10-50`` adds
F7 (index of repo language in the user's recent-language list, miss →
size+50) and F8 (occurrence count) via row UDFs; here both are the native
array expressions from ``albedo_spark.functions`` (no UDF, stays in
codegen).
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.functions import lang_count_in_recent, lang_index_in_recent


class UserRepoTransformer(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    inputCols = Param(
        Params._dummy(), "inputCols", "required input columns",
        TypeConverters.toListString,
    )

    def __init__(
        self,
        inputCols: list[str] = ("repo_language", "user_recent_repo_languages"),
    ):
        super().__init__()
        self._setDefault(inputCols=["repo_language", "user_recent_repo_languages"])
        self._set(inputCols=list(inputCols))

    def _transform(self, dataset: DataFrame) -> DataFrame:
        for c in self.getOrDefault(self.inputCols):
            if c not in dataset.columns:
                raise ValueError(f"Input column {c!r} must exist")
        lang = F.col("repo_language")
        recent = F.col("user_recent_repo_languages")
        return dataset.withColumns(
            {
                "repo_language_index_in_user_recent_repo_languages": lang_index_in_recent(
                    lang, recent
                ),
                "repo_language_count_in_user_recent_repo_languages": lang_count_in_recent(
                    lang, recent
                ),
            }
        )
