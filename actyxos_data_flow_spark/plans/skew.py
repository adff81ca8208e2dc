"""Skew-mitigation queries (operators/skew.py driven).

Salting never changes results — only which task processes which rows —
so the oracles are the plain unsalted SQL: the gate proves the salted
physical plan is row-identical to the logical join/aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import skew as SK
from ..sources import load_table
from . import register


SALTED_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
         AS total_price_fp2
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("skew_salted_join", oracle=SALTED_JOIN_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join through the salted path: orders fan out over 8
    deterministic salts (hashed on the unique o_orderkey), customer is
    replicated 8x, so a hot c_custkey spreads over 8 tasks instead of
    one. The oracle is the unsalted join — identical rows prove the
    rewrite is a pure placement change."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = SK.salted_join(
        orders, cust, "o_custkey", "c_custkey", n=8, salt_expr=F.xxhash64(F.col("o_orderkey"))
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * F.lit(100)).cast("long").cast("decimal(28,0)"))
        .cast("long")
        .alias("total_price_fp2"),
    )


SALTED_DISTINCT_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS distinct_users
FROM events GROUP BY event_type
"""


@register("skew_salted_distinct", oracle=SALTED_DISTINCT_ORACLE)
def skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the sharded two-phase distinct:
    a hot event_type's user set splits across 16 disjoint hash shards
    (phase 1), whose counts sum exactly (phase 2) — no task ever holds
    the full distinct set of a hot key."""
    events = load_table(spark, sf_dir, "events")
    return SK.salted_count_distinct(
        events, ["event_type"], "user_id", n=16, out="distinct_users"
    )
