"""Top-k operators.

W1 (SURVEY.md §2.5) is *the* core idiom of the reference — per-group top-k
via ``rank() over (partition by user order by X desc)`` + filter
(``S/UserProfileBuilder.scala:105-124``, ``S/evaluators/RankingEvaluator.scala:121-139``).

Scale notes:
- ``row_number`` (not ``rank``) with an explicit total-order tiebreak makes
  results deterministic under shuffle (SURVEY.md §7.4 determinism risk).
- The window shuffles once on the partition key and streams each group —
  no per-group materialization, so it survives arbitrarily many groups.
  Skewed groups are bounded by the filter's early-out only after sort; for
  pathological skew pre-aggregate or salt upstream.
- ``global_top_k`` = orderBy+limit: Spark plans TakeOrderedAndProject —
  per-partition heap + driver merge of k rows, no global sort. Keep k small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Deterministic per-group top-k (W1).

    ``order_by`` must induce a total order within each group (append a unique
    id tiebreak) for reproducible output.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def top_k_lists_per_group(
    df: DataFrame,
    group_col: str,
    item_col: str,
    order_by: Sequence[Column],
    k: int,
    list_col: str = "items",
) -> DataFrame:
    """Per-group ordered top-k item *lists* — the full W1+A3 composition
    (rank filter → ``collect_list``) used for recommendation/actual item
    arrays (``S/evaluators/RankingEvaluator.scala:121-139``).

    ``collect_list`` after a shuffle is order-nondeterministic, so the list is
    rebuilt from (rank, item) structs and sorted — deterministic end to end.
    """
    ranked = top_k_per_group(df, [group_col], order_by, k, keep_rank=True)
    return (
        ranked.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("rank"), F.col(item_col).alias("item")))
            ).alias("_ranked")
        )
        .select(
            group_col,
            F.transform(F.col("_ranked"), lambda s: s["item"]).alias(list_col),
        )
    )


def global_top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (O1+O2): planned as TakeOrderedAndProject, not a full sort."""
    return df.orderBy(*order_by).limit(k)
