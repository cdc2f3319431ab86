"""Item co-occurrence — "users who took X also took Y".

The item-item collaborative-filtering primitive behind the reference's
recommender surface (its ALS factorization and content recommender are
model-based routes to the same goal; co-occurrence is the classic
memory-based one — Sarwar et al. 2001, Amazon item-to-item): count how
often two items share a basket, normalize by item popularity (cosine on
the binary basket-incidence vectors), keep top-k per item.

Scale shape (the ``ngram_jaccard_pairs`` inverted-index design applied to
baskets): one (basket, item) projection → per-basket self-join — cost is
Σ basket_size², NOT items² — → pair-count aggregate with map-side
combine → popularity join → ``top_k_per_group``. ``max_basket`` is the
100 TB guard: a mega-basket (a bot account starring everything, an order
with thousands of lines) contributes quadratically while carrying no
preference signal; baskets above the cap are dropped BEFORE the
self-join, consistently with the popularity denominator (the q20
``max_df`` precedent — the result is exact over the kept baskets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from albedo_spark.operators.topk import top_k_per_group


def cooccurrence_topk(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 10,
    max_basket: int | None = None,
) -> DataFrame:
    """Top-``k`` co-occurring items per item:
    ``(item_a, item_b, n_both, cosine_x10k, rank)`` where ``cosine =
    n_both / sqrt(n_a * n_b)`` over distinct baskets (both directions are
    emitted, so every item gets its own ranked list). Integerized score
    (``floor(c·10⁴ + 0.5)``) for engine-portable hashing; ties rank by
    item id ascending.
    """
    # Lazy checkpoint (r16): pairs_base feeds FOUR consumers (both sides
    # of the self-join and both popularity joins) — without the barrier
    # the scan + distinct subtree is planned and executed four times.
    pairs_base = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if max_basket is not None:
        big = (
            pairs_base.groupBy("_b")
            .agg(F.count("*").alias("_sz"))
            .where(F.col("_sz") > max_basket)
            .select("_b")
        )
        # anti-join, not isin: the cap list is data-sized
        pairs_base = pairs_base.join(big, "_b", "left_anti").localCheckpoint(
            eager=False
        )
    pop = pairs_base.groupBy("_i").agg(F.count("*").alias("_n"))
    a, b = pairs_base.alias("a"), pairs_base.alias("b")
    both = (
        a.join(
            b,
            (F.col("a._b") == F.col("b._b"))
            & (F.col("a._i") != F.col("b._i")),
        )
        .groupBy(
            F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b")
        )
        .agg(F.count("*").alias("n_both"))
    )
    pa = pop.select(F.col("_i").alias("item_a"), F.col("_n").alias("_na"))
    pb = pop.select(F.col("_i").alias("item_b"), F.col("_n").alias("_nb"))
    scored = (
        both.join(pa, "item_a")
        .join(pb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.floor(
                F.col("n_both")
                / F.sqrt(F.col("_na") * F.col("_nb"))
                * F.lit(10_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cosine_x10k"),
        )
    )
    return top_k_per_group(
        scored,
        ["item_a"],
        [
            F.col("cosine_x10k").desc(),
            F.col("n_both").desc(),
            F.col("item_b").asc(),
        ],
        k,
        keep_rank=True,
    )
