"""RankingMetricFormatter (M12): prediction DF → per-user ordered top-k
item lists for the RankingEvaluator.

Reference: ``S/transformers/RankingMetricFormatter.scala:12-76``. sourceType
'als' orders by the raw prediction column; 'lr' orders by P(class=1) =
``probability[1]`` — the reference needs a Vector→Array UDF for that (P13);
modern Spark has native ``vector_to_array``.
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.functions import vector_to_array
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.topk import top_k_lists_per_group


class RankingMetricFormatter(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    userCol = Param(Params._dummy(), "userCol", "", TypeConverters.toString)
    itemCol = Param(Params._dummy(), "itemCol", "", TypeConverters.toString)
    predictionCol = Param(Params._dummy(), "predictionCol", "", TypeConverters.toString)
    topK = Param(Params._dummy(), "topK", "", TypeConverters.toInt)
    sourceType = Param(Params._dummy(), "sourceType", "als | lr", TypeConverters.toString)
    # a Param (not a plain attribute) so PipelineModel.save/load round-trips
    # a non-default output column — SURVEY §7.4's finicky-serialization trap
    listCol = Param(Params._dummy(), "listCol", "", TypeConverters.toString)

    def __init__(
        self,
        sourceType: str = "als",
        userCol: str = "user_id",
        itemCol: str = "repo_id",
        predictionCol: str = "prediction",
        topK: int = 30,
        listCol: str = "pred_items",
    ):
        super().__init__()
        self._setDefault(
            sourceType="als", userCol="user_id", itemCol="repo_id",
            predictionCol="prediction", topK=30, listCol="pred_items",
        )
        self._set(
            sourceType=sourceType, userCol=userCol, itemCol=itemCol,
            predictionCol=predictionCol, topK=topK, listCol=listCol,
        )

    def _transform(self, dataset: DataFrame) -> DataFrame:
        user_col = self.getOrDefault(self.userCol)
        item_col = self.getOrDefault(self.itemCol)
        pred_col = self.getOrDefault(self.predictionCol)
        source_type = self.getOrDefault(self.sourceType)
        k = self.getOrDefault(self.topK)

        if source_type == "als":
            order = F.col(pred_col).desc()
        elif source_type == "lr":
            dataset = dataset.withColumn(
                "_p1", vector_to_array(F.col(pred_col)).getItem(1)
            )
            order = F.col("_p1").desc()
        else:
            raise ValueError(f"Unknown sourceType {source_type!r}")

        return top_k_lists_per_group(
            dataset,
            user_col,
            item_col,
            [order, F.col(item_col).asc()],
            k,
            list_col=self.getOrDefault(self.listCol),
        )
