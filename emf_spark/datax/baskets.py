"""Market-basket co-occurrence: which items appear together?

The primitive every recommendation / data-curation pipeline needs and
the one that melts down first at scale: pair generation inside a
basket is quadratic in basket size, so one pathological basket (a
crawler session with 100k items, an order with every SKU) emits 5e9
pairs from a single input group. ``item_pairs`` therefore caps the
items considered per basket DETERMINISTICALLY (the ``max_items``
smallest item ids — a pure function of the data, so any engine and any
retry selects the same representative subset) before the within-basket
self-join, making the per-basket work O(max_items^2) by construction.

Scale shape: one distinct over (basket, item) — map-side combinable —
one bounded row_number window partitioned by basket (never global),
one equi-self-join on the basket key (co-partitioned: both sides share
the distinct's hash partitioning, AQE elides the second exchange), and
a map-side-combinable pair-count aggregate. ``top_pairs`` ranks with
ORDER BY + LIMIT, which Spark executes as TakeOrderedAndProject
(per-partition top-k + k-row merge), never a global sort shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_items: int | None = None,
) -> DataFrame:
    """(item_a, item_b, support) for every unordered item pair
    co-occurring in >= 1 basket, ``item_a < item_b`` canonical, support
    = number of distinct baskets containing both. NULL baskets/items
    are excluded (membership is undefined). With ``max_items`` set,
    only each basket's ``max_items`` smallest items participate —
    the deterministic quadratic-blowup cap documented above."""
    bi = (
        df.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .filter(F.col("_bk").isNotNull() & F.col("_it").isNotNull())
        .distinct()
    )
    if max_items is not None:
        if max_items < 2:
            raise ValueError("max_items must be >= 2 to form any pair")
        w = Window.partitionBy("_bk").orderBy(F.col("_it").asc())
        bi = (
            bi.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_items)
            .drop("_rn")
        )
    a = bi.select(F.col("_bk"), F.col("_it").alias("item_a"))
    b = bi.select(F.col("_bk"), F.col("_it").alias("item_b"))
    return (
        a.join(b, "_bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def top_pairs(pairs: DataFrame, k: int) -> DataFrame:
    """The k highest-support pairs with a total deterministic order
    (support DESC, item_a ASC, item_b ASC) so ties never make the
    result run-dependent. Executes as TakeOrderedAndProject."""
    if k <= 0:
        raise ValueError("k must be positive")
    return pairs.orderBy(
        F.col("support").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(k)
