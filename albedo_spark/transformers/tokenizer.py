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

import pandas as pd
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


# Python-regex twin of TOKEN_PATTERN for the jieba path (re has no
# \p{InCJK...}; explicit BMP ranges: Hiragana, Katakana, Bopomofo, CJK
# compat + unified ideographs)
_CJK_RANGES = "぀-ヿㄅ-ㄯ豈-﫿一-鿿"

# Test hook: a zero-arg factory returning a segmenter ``str -> list[str]``.
# Captured by the pandas_udf CLOSURE (cloudpickle ships it to worker
# processes — sys.modules monkeypatching would not cross that boundary).
# None -> import jieba for real.
_SEGMENT_FACTORY = None


def _jieba_factory():
    import jieba

    jieba.setLogLevel(60)
    return jieba.lcut


class NativeTokenizer(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    inputCol = Param(Params._dummy(), "inputCol", "", TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol", "", TypeConverters.toString)
    shouldRemoveStopWords = Param(
        Params._dummy(), "shouldRemoveStopWords", "", TypeConverters.toBoolean
    )
    # 'unigram' (default): pure-JVM regexp path, CJK character unigrams.
    # 'jieba': dictionary segmentation of CJK runs in an Arrow-batched
    # pandas_udf — M9 parity with the reference's HanLP dictionary
    # segmentation (S/transformers/HanLPTokenizer.scala:15-66). Off by
    # default: jieba is an optional dependency and Python-in-the-loop.
    cjkSegmentation = Param(
        Params._dummy(), "cjkSegmentation", "unigram | jieba",
        TypeConverters.toString,
    )

    def __init__(
        self,
        inputCol: str = "text",
        outputCol: str = "words",
        shouldRemoveStopWords: bool = False,
        cjkSegmentation: str = "unigram",
    ):
        super().__init__()
        self._setDefault(
            inputCol="text", outputCol="words", shouldRemoveStopWords=False,
            cjkSegmentation="unigram",
        )
        self._set(
            inputCol=inputCol, outputCol=outputCol,
            shouldRemoveStopWords=shouldRemoveStopWords,
            cjkSegmentation=cjkSegmentation,
        )

    def _jieba_tokens(self, in_col: str):
        """Arrow-batched tokenizer column: same token rules as the native
        path, but CJK RUNS go through a dictionary segmenter instead of
        splitting to character unigrams."""
        import re

        from pyspark.sql.types import ArrayType, StringType

        factory = _SEGMENT_FACTORY
        if factory is None:
            try:  # fail fast on the driver with a clear message
                import jieba  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "cjkSegmentation='jieba' needs the optional jieba "
                    "package; install it or use the default 'unigram' mode."
                ) from exc
            factory = _jieba_factory

        pat = re.compile(rf"[cf]\#|c\+\+|[a-z0-9_]+|[{_CJK_RANGES}]+")
        cjk_start = re.compile(rf"[{_CJK_RANGES}]")

        @F.pandas_udf(ArrayType(StringType()))
        def tok(s: pd.Series) -> pd.Series:
            seg = factory()

            def one(text):
                if text is None:
                    return None
                out = []
                for run in pat.findall(text.lower()):
                    if cjk_start.match(run):
                        out.extend(t for t in seg(run) if t.strip())
                    else:
                        out.append(run)
                return out

            return s.map(one)

        return tok(F.col(in_col))

    def _transform(self, dataset: DataFrame) -> DataFrame:
        in_col = self.getOrDefault(self.inputCol)
        out_col = self.getOrDefault(self.outputCol)
        if self.getOrDefault(self.cjkSegmentation) == "jieba":
            toks = self._jieba_tokens(in_col)
        else:
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
