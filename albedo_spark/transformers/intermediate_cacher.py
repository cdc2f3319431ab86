"""IntermediateCacher (M11): a pipeline stage that projects and caches.

Reference: ``S/transformers/IntermediateCacher.scala:10-40``. Exists because
multi-stage pipelines re-traverse their input once per estimator stage —
caching at strategic points is semantic for pipeline cost, not a
micro-optimization (SURVEY.md §4 materialization row).
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IntermediateCacher(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    inputCols = Param(
        Params._dummy(), "inputCols", "columns to keep (empty = all)",
        TypeConverters.toListString,
    )

    def __init__(self, inputCols: list[str] = ()):
        super().__init__()
        self._setDefault(inputCols=[])
        self._set(inputCols=list(inputCols))

    def _transform(self, dataset: DataFrame) -> DataFrame:
        cols = self.getOrDefault(self.inputCols)
        if cols:
            dataset = dataset.select(*[F.col(c) for c in cols])
        return dataset.cache()
