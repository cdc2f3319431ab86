"""NativeTokenizer (M9 rebuild).

Reference: ``S/transformers/HanLPTokenizer.scala:15-66`` — HanLP CJK
segmentation (JVM-only lib), keeps programming-language tokens like
``c/r/c++/c#/f#``, drops 1-char non-CJK tokens, optional stopword removal.

Rebuild: a native ``regexp_extract_all`` tokenizer — word runs, the special
language tokens, and single CJK ideographs as their own tokens (character
unigrams stand in for HanLP's dictionary segmentation; for real CJK quality
plug a jieba pandas_udf behind the same interface). No Python in the loop.
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.feature import StopWordsRemover
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CJK_CLASS = (
    r"\p{InHiragana}\p{InKatakana}\p{InBopomofo}"
    r"\p{InCJKCompatibilityIdeographs}\p{InCJKUnifiedIdeographs}"
)
# c++/c#/f# first so they win over plain word runs; then words; then CJK chars
TOKEN_PATTERN = rf"([cf]\#|c\+\+|[a-z0-9_]+|[{_CJK_CLASS}])"


class NativeTokenizer(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    inputCol = Param(Params._dummy(), "inputCol", "", TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol", "", TypeConverters.toString)
    shouldRemoveStopWords = Param(
        Params._dummy(), "shouldRemoveStopWords", "", TypeConverters.toBoolean
    )

    def __init__(
        self,
        inputCol: str = "text",
        outputCol: str = "words",
        shouldRemoveStopWords: bool = False,
    ):
        super().__init__()
        self._setDefault(inputCol="text", outputCol="words", shouldRemoveStopWords=False)
        self._set(
            inputCol=inputCol, outputCol=outputCol,
            shouldRemoveStopWords=shouldRemoveStopWords,
        )

    def _transform(self, dataset: DataFrame) -> DataFrame:
        in_col = self.getOrDefault(self.inputCol)
        out_col = self.getOrDefault(self.outputCol)
        toks = F.regexp_extract_all(
            F.lower(F.col(in_col)), F.lit(TOKEN_PATTERN), 1
        )
        # drop 1-char tokens unless CJK or the language names c / r
        # (HanLPTokenizer.scala:42-47)
        keep = F.filter(
            toks,
            lambda t: (F.length(t) > 1)
            | t.isin("c", "r")
            | t.rlike(f"[{_CJK_CLASS}]"),
        )
        out = dataset.withColumn(out_col, keep)
        if self.getOrDefault(self.shouldRemoveStopWords):
            stops = F.array(
                *[F.lit(s) for s in StopWordsRemover.loadDefaultStopWords("english")]
            )
            out = out.withColumn(
                out_col, F.filter(F.col(out_col), lambda t: ~F.array_contains(stops, t))
            )
        return out
