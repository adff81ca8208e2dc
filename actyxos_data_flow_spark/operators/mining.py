"""Frequent-itemset / association-rule mining over transaction tables.

Transposes the reference's grouped co-occurrence idiom (group_by →
join within group, ``src/flow.rs`` grouped joins) onto the classic
market-basket shape: baskets are groups, the pair generator is a
basket-key equi-join, and rule statistics (support / confidence /
lift) are exact integer counts with fp6 integer quotients, at the
end, in doubles.

Scale notes: the pair join is an equi-join on the basket key, so its
cost is Σ per-basket |items|² — bounded when baskets are bounded
(TPC-H orders hold ≤7 lineitems; real carts are small). For corpora
with pathological baskets, cap the basket size up front (the
``max_basket`` guard drops oversized baskets the way the LSH paths cap
``max_bucket``: an explicit, measured trade documented in the output).
Support counting is one map-side-combined hash aggregate; the item
support table is item-sized and broadcast back onto the pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BASKET = 64  # drop baskets larger than this before pairing


def pair_rules(
    tx: DataFrame,
    basket: str = "basket_id",
    item: str = "item",
    min_support: int = 2,
    max_basket: int = MAX_BASKET,
) -> DataFrame:
    """Association rules over item PAIRS: for every unordered pair
    {a, b} co-occurring in >= ``min_support`` baskets, emit exact
    support counts plus fp6-integer confidence(a→b), confidence(b→a)
    and lift,
    computed from integer counts and rounded to 6dp.

    lift = sup_ab·N / (sup_a·sup_b) — both operands exact BIGINT
    products, one double division, so the 6dp round is bit-stable
    across engines."""
    t = tx.select(F.col(basket).alias("b"), F.col(item).alias("i")).distinct()
    sized = t.join(
        t.groupBy("b").agg(F.count(F.lit(1)).alias("_bs")).filter(
            F.col("_bs") <= max_basket
        ),
        "b",
        "left_semi",
    ).localCheckpoint()  # scanned 3×: supports, both sides of the pair join
    n_baskets = sized.select("b").distinct().count()
    sup = sized.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("s"))
    pa = sized.select("b", F.col("i").alias("item_a"))
    pb = sized.select("b", F.col("i").alias("item_b"))
    pairs = (
        pa.join(pb, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("sup_ab"))
        .filter(F.col("sup_ab") >= min_support)
    )
    sa = sup.select(F.col("i").alias("item_a"), F.col("s").alias("sup_a"))
    sb = sup.select(F.col("i").alias("item_b"), F.col("s").alias("sup_b"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            "sup_ab",
            "sup_a",
            "sup_b",
            F.expr("(sup_ab * 1000000) DIV sup_a").alias("conf_a_b_fp6"),
            F.expr("(sup_ab * 1000000) DIV sup_b").alias("conf_b_a_fp6"),
            F.expr(f"(sup_ab * CAST({n_baskets} AS BIGINT) * 1000000) DIV (sup_a * sup_b)").alias(
                "lift_fp6"
            ),
        )
    )
