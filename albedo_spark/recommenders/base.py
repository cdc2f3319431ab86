"""Abstract Recommender — the reference's core serving abstraction.

Reference: ``S/recommenders/Recommender.scala:9-69``: a ``Transformer`` with
params (userCol/itemCol/scoreCol/sourceCol/topK), an output-schema contract
(user, item, score, source), and ``transform(userDF) = recommendForUsers``.
Conformance to the ``pyspark.ml`` Transformer/Params contract is itself a
reference capability (SURVEY.md §2.11 intro).
"""

from __future__ import annotations

from abc import abstractmethod

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType


class RecommenderParams(Params):
    userCol = Param(
        Params._dummy(), "userCol", "user id column", TypeConverters.toString
    )
    itemCol = Param(
        Params._dummy(), "itemCol", "item id column", TypeConverters.toString
    )
    scoreCol = Param(
        Params._dummy(), "scoreCol", "score column", TypeConverters.toString
    )
    sourceCol = Param(
        Params._dummy(), "sourceCol", "source tag column", TypeConverters.toString
    )
    topK = Param(
        Params._dummy(), "topK", "recommendations per user", TypeConverters.toInt
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            userCol="user_id",
            itemCol="repo_id",
            scoreCol="score",
            sourceCol="source",
            topK=15,
        )

    def getUserCol(self) -> str:
        return self.getOrDefault(self.userCol)

    def getItemCol(self) -> str:
        return self.getOrDefault(self.itemCol)

    def getScoreCol(self) -> str:
        return self.getOrDefault(self.scoreCol)

    def getSourceCol(self) -> str:
        return self.getOrDefault(self.sourceCol)

    def getTopK(self) -> int:
        return self.getOrDefault(self.topK)


class Recommender(
    Transformer, RecommenderParams, DefaultParamsReadable, DefaultParamsWritable
):
    """``transform(user_df)`` → (userCol, itemCol, scoreCol(double),
    sourceCol(string)) with ≤ topK rows per user.

    Input schema check mirrors ``Recommender.transformSchema``
    (S/recommenders/Recommender.scala:46-56): the user column must exist and
    be integral.
    """

    def __init__(self, **kwargs):
        super().__init__()
        self._set(**{k: v for k, v in kwargs.items() if v is not None})

    def _validate_input(self, user_df: DataFrame) -> None:
        user_col = self.getUserCol()
        if user_col not in user_df.columns:
            raise ValueError(f"Input must contain column {user_col!r}")
        dtype = user_df.schema[user_col].dataType
        if not isinstance(dtype, (IntegerType, LongType)):
            raise ValueError(
                f"Column {user_col!r} must be integral, got {dtype.simpleString()}"
            )

    @abstractmethod
    def recommend_for_users(self, user_df: DataFrame) -> DataFrame:
        ...

    def _transform(self, dataset: DataFrame) -> DataFrame:
        self._validate_input(dataset)
        return self.recommend_for_users(dataset)
