"""Array-expression utilities shared by the text/dedup operator families."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and pass the materialized value to
    ``fn`` as a lambda-bound variable (single-element transform).

    Column expressions are trees, not values: every reference re-evaluates
    the subtree, and a reference inside a higher-order-function lambda
    re-evaluates it per ELEMENT. Any expensive array expression read more
    than once (or fed to several aggregates) should pass through here —
    the q67 repetition query went 110 s → 2.4 s on exactly this change.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)
