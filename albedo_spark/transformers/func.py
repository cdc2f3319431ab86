"""FuncTransformer (M14): a Column-function as a pipeline Transformer.

Reference: ``S/transformers/FuncTransformer.scala:45-140`` wraps an
arbitrary UDF and java-serializes it for save/load (defined but unused by
the reference's jobs). Spark-first difference: the wrapped function here
is ``Column -> Column`` — a native *expression* builder, not a UDF — so
anything built from pyspark.sql.functions stays whole-stage-codegen'd.
Persistence of the function object is intentionally NOT supported
(python closures don't round-trip through params); persist the composed
pipeline's OUTPUT, or use a named transformer class instead."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FuncTransformer(Transformer):
    inputCol = Param(Params._dummy(), "inputCol", "", TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol", "", TypeConverters.toString)

    def __init__(
        self,
        func: Callable[[Column], Column],
        inputCol: str = "input",
        outputCol: str = "output",
    ):
        super().__init__()
        self.func = func
        self._setDefault(inputCol="input", outputCol="output")
        self._set(inputCol=inputCol, outputCol=outputCol)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.withColumn(
            self.getOrDefault(self.outputCol),
            self.func(F.col(self.getOrDefault(self.inputCol))),
        )
