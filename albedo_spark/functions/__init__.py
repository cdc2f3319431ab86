"""Native column-expression replacements for the reference's UDF surface
(SURVEY.md §2.10) plus vector math helpers.

Everything here is a pure Column expression — JVM-side, whole-stage-codegen
friendly. No Python UDFs.
"""

from albedo_spark.functions.text import (
    clean_company,
    clean_email,
    clean_location,
    contains_any,
    flag_any_like,
    lang_count_in_recent,
    lang_index_in_recent,
    null_flag,
)
from albedo_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "clean_company", "clean_email", "clean_location", "contains_any",
    "flag_any_like", "lang_count_in_recent", "lang_index_in_recent",
    "null_flag", "cosine_similarity", "dot", "l2_norm",
]
