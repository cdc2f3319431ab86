"""NegativeBalancer (M7): implicit-feedback negative sampling.

Reference: ``S/transformers/NegativeBalancer.scala:13-119``. Semantics: for
each user with P positive items, emit ``floor(P · ratio)`` negatives drawn
from the popular-item set minus the user's positives, tagged with label
``negativeValue`` and the sentinel timestamp ``1999-07-01T00:00:00``; union
onto the positives.

The reference does this with an RDD ``aggregateByKey`` into mutable hash
sets plus a driver-broadcast ``LinkedHashSet`` (A6/U3). Rebuild is pure
DataFrame:

- per-user positive sets via ``collect_set`` (one shuffle, map-side
  combined),
- the popular list is folded in as an *array literal* (it is topN popular
  items — small by construction; the reference broadcasts the same thing),
- negatives = ``array_except(popular, positives)`` sliced to the required
  count, then ``explode``.

Determinism: the reference's LinkedHashSet preserves popularity order, so
``slice`` takes the *most popular* unseen items — we reproduce exactly that
(popular_items must be passed in popularity-desc order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTINEL_TIMESTAMP = "1999-07-01T00:00:00.000+0000"


class NegativeBalancer(
    Transformer, DefaultParamsReadable, DefaultParamsWritable
):
    userCol = Param(Params._dummy(), "userCol", "", TypeConverters.toString)
    itemCol = Param(Params._dummy(), "itemCol", "", TypeConverters.toString)
    timeCol = Param(Params._dummy(), "timeCol", "", TypeConverters.toString)
    labelCol = Param(Params._dummy(), "labelCol", "", TypeConverters.toString)
    negativeValue = Param(
        Params._dummy(), "negativeValue", "", TypeConverters.toFloat
    )
    negativePositiveRatio = Param(
        Params._dummy(), "negativePositiveRatio", "", TypeConverters.toFloat
    )
    # a Param (not a plain attribute) so PipelineModel.save/load round-trips
    # the candidate pool — as a plain attribute it silently loaded back empty
    # and a restored pipeline emitted zero negatives
    popularItems = Param(
        Params._dummy(), "popularItems", "candidate negative item ids",
        TypeConverters.toListInt,
    )

    def __init__(
        self,
        popular_items: Sequence[int] = (),
        userCol: str = "user_id",
        itemCol: str = "repo_id",
        timeCol: str = "starred_at",
        labelCol: str = "starring",
        negativeValue: float = 0.0,
        negativePositiveRatio: float = 1.0,
    ):
        super().__init__()
        self._setDefault(
            userCol="user_id", itemCol="repo_id", timeCol="starred_at",
            labelCol="starring", negativeValue=0.0, negativePositiveRatio=1.0,
            popularItems=[],
        )
        self._set(
            userCol=userCol, itemCol=itemCol, timeCol=timeCol,
            labelCol=labelCol, negativeValue=negativeValue,
            negativePositiveRatio=negativePositiveRatio,
            popularItems=list(popular_items),
        )

    @property
    def popular_items(self) -> list[int]:
        return self.getOrDefault(self.popularItems)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        user_col = self.getOrDefault(self.userCol)
        item_col = self.getOrDefault(self.itemCol)
        time_col = self.getOrDefault(self.timeCol)
        label_col = self.getOrDefault(self.labelCol)
        ratio = self.getOrDefault(self.negativePositiveRatio)
        neg_value = self.getOrDefault(self.negativeValue)

        for col_name in (user_col, item_col, time_col, label_col):
            if col_name not in dataset.columns:
                raise ValueError(f"Column {col_name!r} must exist")

        popular = F.array(*[F.lit(int(i)) for i in self.popular_items])
        per_user = dataset.groupBy(user_col).agg(
            F.collect_set(item_col).alias("_pos")
        )
        negatives = (
            per_user.withColumn(
                "_neg",
                F.slice(
                    F.array_except(popular, F.col("_pos")),
                    1,
                    F.floor(F.size("_pos") * ratio).cast("int"),
                ),
            )
            .select(F.col(user_col), F.explode("_neg").alias(item_col))
            .select(
                F.col(user_col),
                F.col(item_col),
                F.lit(SENTINEL_TIMESTAMP).cast("timestamp").alias(time_col),
                F.lit(neg_value).cast("double").alias(label_col),
            )
        )
        return dataset.select(user_col, item_col, time_col, label_col).unionByName(
            negatives
        )
