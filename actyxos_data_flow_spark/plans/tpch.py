"""TPC-H-style headline queries over the synthetic star schema.

The reference ships no benchmark (BASELINE.md), so these are the
engine's throughput workload: classic shapes (scan-agg, multi-way join,
selective filter-sum) sized by the driver's sf0.1 bench. All money math
runs in exact DECIMAL then casts to DOUBLE (functions.scalar rationale:
bit-identical under any partial-aggregation order — mandatory for a
value-hash gate at cluster parallelism).

Columns available differ slightly from real TPC-H (TESTDATA.md); queries
are adapted to the present subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register


def _dec(c, s=2):
    return F.col(c).cast(f"decimal(18,{s})")


# -- Q1: pricing summary (scan + 2-key hash agg, 7 aggregates) -------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST((1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(9,4)))
            AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("sum_disc_price"),
            F.sum(
                _dec("l_extendedprice")
                * ((F.lit(1) - _dec("l_discount")) * (F.lit(1) + _dec("l_tax"))).cast("decimal(9,4)")
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -- Q3: shipping priority (3-way join + agg) ------------------------------

Q3_ORACLE = """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       epoch_us(o.o_orderdate) AS orderdate_micros,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE, bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join order: lineitem (fact) ⋈ orders (mid) ⋈ customer (dim,
    broadcast). Filters reach the scans; the fact table is never
    shuffled for the dim join."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"),
        li.l_orderkey == orders.o_orderkey,
        "inner",
    )
    return joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("revenue")
    ).select(
        "l_orderkey",
        "revenue",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_micros"),
        "o_orderpriority",
    )


# -- Q5: local supplier volume (6-way join) --------------------------------

Q5_ORACLE = """
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1994-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-01-01'
GROUP BY n.n_name
"""


@register("q5_local_supplier", oracle=Q5_ORACLE, bench=True)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All dimensions broadcast; the only shuffle is lineitem⋈orders and
    the final 1-key agg (which AQE collapses to a handful of partitions)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    oc = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    joined = li.join(F.broadcast(oc.select("o_orderkey", "c_nationkey")), li.l_orderkey == F.col("o_orderkey")).join(
        F.broadcast(dims.select("s_suppkey", "s_nationkey", "n_name")),
        (li.l_suppkey == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("revenue")
    )


# -- Q6: forecasting revenue change (selective filter + global sum) --------

Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_revenue_change", oracle=Q6_ORACLE, bench=True)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# -- Q18-ish: large-volume customers (join + having) -----------------------

Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c.c_name, o.o_orderkey, epoch_us(o.o_orderdate) AS orderdate_micros,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


@register("q18_large_customers", oracle=Q18_ORACLE, bench=True)
def q18_large_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg-then-join: the HAVING filter shrinks the fact side before any
    join; both joins then broadcast the small filtered sides."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_tq"))
        .filter(F.col("_tq") > 150)
        .select("l_orderkey", F.col("_tq").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_micros"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )
