"""TPC-H-style headline queries over the synthetic star schema.

The reference ships no benchmark (BASELINE.md), so these are the
engine's throughput workload: classic shapes (scan-agg, multi-way join,
selective filter-sum) sized by the driver's sf0.1 bench. All money math
is scaled-integer BIGINT end-to-end: per-row terms are exact integer
cents (x100 of the 2dp inputs, so sums are *_fp2, one product *_fp4,
two products *_fp6), averages/shares are truncating integer DIVs, and
threshold memberships are cross-multiplied integer comparisons —
bit-identical under any partial-aggregation order AND any engine build
(round 8: hashed DOUBLEs and precision-38 decimal products split in
the driver environment; decimal→double exactness also ends at 2^53
scaled units, ~sf10 for these sums).

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


def _cents(c: str):
    """Exact integer cents of a 2dp money column stored as DOUBLE: the
    DECIMAL(12,2) cast rounds HALF_UP onto the 2dp grid the generator
    wrote (both engines round-nearest double→decimal), then x100 is an
    integral value cast losslessly to BIGINT. Narrow precision keeps
    every later product in plain 64-bit integer land — the round-8
    driver run split on the DECIMAL(18,2) product chain whose result
    precision lands exactly AT 38."""
    return (F.col(c).cast("decimal(12,2)") * F.lit(100)).cast("long")


def _rev4():
    """Per-row revenue as an exact x10^4 BIGINT: cents(price) x integer
    discount-complement — the scaled-integer replacement for the hashed
    DOUBLE sum(DECIMAL x DECIMAL) family."""
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


# the same per-row term as DuckDB SQL text (oracle side of _rev4)
_REV4_SQL = (
    "CAST(CAST({a}l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    " * (100 - CAST(CAST({a}l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))"
)


# -- Q1: pricing summary (scan + 2-key hash agg, 7 aggregates) -------------

# All money/quantity aggregates are scaled-integer BIGINTs (x100 cents
# per 2dp input, so sums are _fp2, one product _fp4, two products _fp6)
# and averages are truncating integer DIVs (_fp6). Round 8 showed the
# hashed-DOUBLE form of this family is latent-unsafe: the DECIMAL
# product chain lands at precision 38 (engine builds differ on the
# spill) and decimal→double exactness ends at 2^53 scaled units
# (~sf10 for these sums).
Q1_ORACLE = """
WITH q1r AS (
  SELECT l_returnflag, l_linestatus,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q_c,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p_c,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d_c,
         CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) AS t_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(q_c) AS BIGINT) AS sum_qty_fp2,
       CAST(sum(p_c) AS BIGINT) AS sum_base_price_fp2,
       CAST(sum(p_c * (100 - d_c)) AS BIGINT) AS sum_disc_price_fp4,
       CAST(sum(p_c * (100 - d_c) * (100 + t_c)) AS BIGINT) AS sum_charge_fp6,
       CAST((sum(q_c) * 10000) // count(*) AS BIGINT) AS avg_qty_fp6,
       CAST((sum(d_c) * 10000) // count(*) AS BIGINT) AS avg_disc_fp6,
       count(*) AS count_order
FROM q1r
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q_c, p_c, d_c, t_c = (_cents(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(q_c.cast("decimal(28,0)")).cast("long").alias("sum_qty_fp2"),
            F.sum(p_c.cast("decimal(28,0)")).cast("long").alias("sum_base_price_fp2"),
            F.sum((p_c * (F.lit(100) - d_c)).cast("decimal(28,0)")).cast("long").alias("sum_disc_price_fp4"),
            F.sum((p_c * (F.lit(100) - d_c) * (F.lit(100) + t_c)).cast("decimal(28,0)"))
            .cast("long")
            .alias("sum_charge_fp6"),
            F.sum(d_c.cast("decimal(28,0)")).cast("long").alias("_sum_d_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty_fp2",
            "sum_base_price_fp2",
            "sum_disc_price_fp4",
            "sum_charge_fp6",
            F.expr("CAST((sum_qty_fp2 * 10000) DIV count_order AS BIGINT)").alias("avg_qty_fp6"),
            F.expr("CAST((_sum_d_c * 10000) DIV count_order AS BIGINT)").alias("avg_disc_fp6"),
            "count_order",
        )
    )


# -- Q3: shipping priority (3-way join + agg) ------------------------------

Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS revenue_fp4,
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
        F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("revenue_fp4")
    ).select(
        "l_orderkey",
        "revenue_fp4",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_micros"),
        "o_orderpriority",
    )


# -- Q5: local supplier volume (6-way join) --------------------------------

Q5_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS revenue_fp4
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
        F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("revenue_fp4")
    )


# -- Q6: forecasting revenue change (selective filter + global sum) --------

Q6_ORACLE = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_fp4,
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
            F.sum((_cents("l_extendedprice") * _cents("l_discount")).cast("decimal(28,0)"))
            .cast("long")
            .alias("revenue_fp4"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# -- Q18-ish: large-volume customers (join + having) -----------------------

Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS total_qty_fp2
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) > 15000
)
SELECT c.c_name, o.o_orderkey, epoch_us(o.o_orderdate) AS orderdate_micros,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS o_totalprice_fp2,
       b.total_qty_fp2
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
        .agg(F.sum(_cents("l_quantity").cast("decimal(28,0)")).cast("long").alias("total_qty_fp2"))
        .filter(F.col("total_qty_fp2") > 15000)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_micros"),
            _cents("o_totalprice").alias("o_totalprice_fp2"),
            "total_qty_fp2",
        )
    )


# -- Q4-shape: order priority checking (EXISTS semi-join) ------------------
# Adapted to the present columns: an order counts when SOME line item
# shipped after the order date (no commit/receipt dates in this schema).

Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1994-01-01'
  AND o.o_orderdate < TIMESTAMP '1994-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → LEFT SEMI join: the probe side (orders) is filtered at
    the scan; the semi join never duplicates orders however many line
    items match, and only (l_orderkey, l_shipdate) is read from the
    fact table (column pruning)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1994-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# -- Q13-shape: customer order-count distribution (left outer join) --------

Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeps customers with zero orders (count(col) over
    the null-extended side counts 0, as in SQL); two hash aggregates,
    the second over a tiny domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# -- Q14-shape: promotion effect (conditional aggregate over a join) -------

# revenue terms are exact 4dp rationals. The round-8 driver run showed
# a hash split from the DECIMAL(18,2)x(1-DECIMAL(18,2)) product chain
# (result precision lands exactly AT 38, where engine builds differ on
# the spill behavior), so every per-row term is now a pure BIGINT
# product of integer cents: rev4 = cents(price) * (100 - cents(disc)),
# an exact x10^4 integer. Sums and the final ratio are integer
# arithmetic end-to-end — no decimal precision arithmetic anywhere near
# the 38 ceiling, no doubles anywhere in the hash.
Q14_ORACLE = """
WITH q14r AS (
  SELECT CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
         * (100 - CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev4,
         CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1995-09-01' AND l.l_shipdate < TIMESTAMP '1995-10-01'
)
SELECT CAST(sum(promo * rev4 * 100000000) // sum(rev4) AS BIGINT) AS promo_revenue_fp6
FROM q14r
"""


@register("q14_promo_revenue", oracle=Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective date window reaches the lineitem scan; part is a
    broadcast dim; each row's revenue term is an exact x10^4 BIGINT
    (integer cents x integer discount-complement) and the promo ratio
    is one truncating integer DIV of their sums (fp6)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    # DECIMAL(38,0) sums give 100-TB headroom (terms are ~1e17 after
    # the x1e8 scale-up); values stay far from the 38-digit ceiling
    num = F.sum(
        F.when(F.col("p_type").like("PROMO%"), rev4 * F.lit(100000000))
        .otherwise(F.lit(0))
        .cast("decimal(28,0)")
    )
    den = F.sum(rev4.cast("decimal(28,0)"))
    return joined.agg(num.alias("_num"), den.alias("_den")).select(
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("promo_revenue_fp6")
    )


# -- Q16-shape: supplier count by part attributes (anti join) --------------
# partsupp doesn't exist in this schema; the observed (l_partkey,
# l_suppkey) pairs in lineitem play its role. "Complaint" suppliers are
# those with negative account balance.

Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'SMALL%'
  AND p.p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register("q16_supplier_count", oracle=Q16_ORACLE)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → LEFT ANTI join against the (small, broadcast) excluded
    supplier set; part filters stay at the scan; count(DISTINCT) is a
    two-phase hash aggregate."""
    ps = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("SMALL%"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    kept = ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
    return (
        kept.join(F.broadcast(part), kept.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# -- Q19-shape: discounted revenue (disjunctive predicate pushdown) --------

Q19_ORACLE = f"""
SELECT CAST(sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS revenue_fp4
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity >= 1  AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("q19_discounted_revenue", oracle=Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-table predicate: Catalyst pushes the
    single-table residuals (brand/size to part, quantity range union to
    lineitem) below the join and keeps the cross-term as the join
    filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("revenue_fp4")
    )


# -- Q22-shape: global sales opportunity (scalar subquery + anti join) -----
# No phone column: nation key takes the country-code role.

Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS s_c,
         count(*) AS cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS totacctbal_fp2
FROM customer c, avg_bal
WHERE CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) * avg_bal.cnt > avg_bal.s_c
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
"""


@register("q22_sales_opportunity", oracle=Q22_ORACLE)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average, computed once and broadcast as a
    1-row cross join) + NOT EXISTS → LEFT ANTI join on orders. The
    bal > avg membership test is the cross-multiplied integer form
    cents(bal)·count > sum(cents) — exact on both engines (the double
    quotient could land within a build-dependent ulp of a customer's
    exact balance)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents("c_acctbal").cast("decimal(28,0)")).cast("long").alias("_s_c"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        _cents("c_acctbal") * F.col("_cnt") > F.col("_s_c")
    )
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_cents("c_acctbal").cast("decimal(28,0)")).cast("long").alias("totacctbal_fp2"),
    )


# -- Q7-shape: volume shipping between two nations -------------------------
# Reference shape: TPC-H Q7 (nation-pair disjunction + year rollup).

Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS revenue_fp4
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE, bench=True)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair disjunction: each nation filter pushes below its own
    dim join (supplier and customer sides keep only the two nations
    before any fact shuffle); the cross-pair condition is the only
    residual after both joins. Fact-fact joins (lineitem x orders x
    customer) shuffle on their keys; AQE may demote to broadcast at
    small SF, while at cluster scale they stay shuffle joins -- the
    nation pre-filter has already cut both probe sides."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    nations = ["NATION_1", "NATION_2"]
    n1 = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    n2 = n1.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey", "cust_nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("revenue_fp4"))
    )


# -- Q8-shape: national market share ---------------------------------------
# Reference shape: TPC-H Q8 (share-of-total via conditional sum).

Q8_ORACLE = f"""
SELECT year(o.o_orderdate) AS o_year,
       CAST((sum(CASE WHEN n2.n_name = 'NATION_2'
                      THEN {_REV4_SQL.format(a="l.")} ELSE 0 END) * 1000000)
            // sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS mkt_share_fp6
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o.o_orderdate)
"""


@register("q8_market_share", oracle=Q8_ORACLE, bench=True)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total: one pass, two conditional decimal sums, divided
    after aggregation -- no self-join on the grouped result. The part
    type filter prunes the fact at its first join; region restricts the
    customer side before the fact shuffle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    nat_rev4 = F.when(F.col("supp_nation") == "NATION_2", _rev4()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nat_rev4.cast("decimal(28,0)")).alias("_num"),
            F.sum(_rev4().cast("decimal(28,0)")).alias("_den"),
        )
        .select(
            "o_year",
            # narrow the numerator before the x10^6 scale-up so the
            # decimal product stays at precision 36, never AT the cap
            F.expr(
                "CAST((CAST(_num AS DECIMAL(28,0)) * 1000000) DIV _den AS BIGINT)"
            ).alias("mkt_share_fp6"),
        )
    )


# -- Q10-shape: returned item reporting ------------------------------------
# Reference shape: TPC-H Q10; the top-20 LIMIT is replaced by a revenue
# floor so the result set is deterministic under the order-insensitive
# value-hash gate (LIMIT with ties is not).

Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       CAST(sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS revenue_fp4,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS c_acctbal_fp2,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
HAVING sum({_REV4_SQL.format(a="l.")}) > 1000000000
"""


@register("q10_returned_items", oracle=Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fact filters (quarter, returnflag) sit at the scans; the
    orders x lineitem join shuffles on orderkey, then one hash aggregate
    keyed on the customer; customer and nation broadcast. The HAVING is
    applied on the exact decimal sum (pre-cast) to match the oracle on
    boundary values."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("revenue_fp4"))
        .filter(F.col("revenue_fp4") > 1000000000)
        .select(
            "c_custkey",
            "c_name",
            "revenue_fp4",
            _cents("c_acctbal").alias("c_acctbal_fp2"),
            "n_name",
        )
    )


# -- Q15-shape: top supplier (agg -> global max -> equality join) ----------

Q15_ORACLE = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV4_SQL.format(a="")}) AS BIGINT) AS total_revenue_fp4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_fp4
FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue_fp4 = (SELECT max(total_revenue_fp4) FROM revenue0)
"""


@register("q15_top_supplier", oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-of-aggregate scalar subquery: per-supplier revenue is
    computed once, its global max reduces to one row, broadcast back as
    a cross join -- the revenue view is NOT recomputed for the subquery
    (single shuffle; the max is a map-side-combinable second agg)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("total_revenue_fp4"))
    )
    top = rev.agg(F.max("total_revenue_fp4").alias("_top"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue_fp4") == F.col("_top"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_fp4")
    )


# -- Q17-shape: small-quantity-order revenue (correlated avg subquery) -----

Q17_ORACLE = """
SELECT CAST((sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) * 10000) // 7
       AS BIGINT) AS avg_yearly_fp6
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND 5 * CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      < (SELECT sum(CAST(CAST(l3.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
         FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)
"""


@register("q17_small_quantity", oracle=Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated avg subquery decorrelated to a per-partkey aggregate
    joined back on the key (each partkey's average over ALL its line
    items equals the average over the brand-joined rows, because the
    join is key-equality). The qty < 0.2·avg membership is the
    cross-multiplied integer form 5·cents(qty)·count < sum(cents) —
    EXACT: with 2dp quantities a row can sit precisely ON the 0.2·avg
    boundary, where the double-quotient form is build-dependent."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    matched = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_q = matched.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_cents("l_quantity").cast("decimal(28,0)")).cast("long").alias("_sq"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return (
        matched.join(avg_q, matched.l_partkey == avg_q._pk)
        .filter(F.lit(5) * _cents("l_quantity") * F.col("_cnt") < F.col("_sq"))
        .agg(
            F.expr(
                "CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) * 10000)"
                " DIV 7 AS BIGINT)"
            ).alias("avg_yearly_fp6")
        )
    )


# -- Rollup: hierarchical subtotals (GROUPING SETS) ------------------------

ROLLUP_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
         AS total_price_fp2
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@register("rollup_order_totals", oracle=ROLLUP_ORACLE)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ``rollup`` — one pass, one Expand node
    feeding a single hash aggregate (Catalyst plans all three grouping
    sets in one shuffle, vs three scans + a union by hand). Null slots
    from the rollup are relabeled 'ALL' so they survive the oracle's
    null-insensitive hash distinctly from genuine data nulls (the
    status/priority columns are non-null in this data)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice").cast("decimal(28,0)")).cast("long").alias("total_price_fp2"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price_fp2",
        )
    )


# -- Cube: all-dimension subtotals -----------------------------------------

CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_fp2
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_lineitem_qty", oracle=CUBE_ORACLE)
def cube_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (returnflag, linestatus): 4 grouping sets, one
    Expand + one hash aggregate — the map-side combine still applies per
    grouping set, so the shuffle carries subtotal rows, not raw data."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_cents("l_quantity").cast("decimal(28,0)")).cast("long").alias("sum_qty_fp2"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty_fp2",
        )
    )


# -- Q12-shape: shipping-lateness by priority ------------------------------
# Adapted: no l_shipmode/commitdate in this schema — lateness is
# shipdate > orderdate + 90 days, classes are order priorities.

# CAST AS BIGINT: DuckDB sum(INTEGER) is HUGEINT (int128) — see
# PIVOT_ORACLE in relational.py for why that breaks the driver's hash.
Q12_ORACLE = """
SELECT o.o_orderpriority,
       CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT)
         AS late_count,
       count(*) AS total_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY o.o_orderpriority
"""


@register("q12_late_shipments", oracle=Q12_ORACLE)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count rollup over a fact-fact join: the year filter
    prunes lineitem at the scan, the join shuffles both sides on
    orderkey once, and the CASE sums ride the same hash aggregate
    (no second pass per class)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(late).alias("late_count"), F.count(F.lit(1)).alias("total_count"))
    )


# -- Q21 (adapted): suppliers who kept orders waiting ----------------------

Q21_ORACLE = """
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY l_orderkey
)
SELECT s.s_name, count(*) AS numwait
FROM lo l1
JOIN per_order p ON l1.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
WHERE l1.is_late AND p.n_supp >= 2 AND p.n_late_supp = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@register("q21_suppliers_waiting", oracle=Q21_ORACLE, bench=True)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted (no l_commitdate/l_receiptdate in TESTDATA — "late"
    is the q12 lateness predicate, shipped >90 days after order date;
    no partsupp needed). The classic EXISTS / NOT-EXISTS pair over
    lineitem self-joins is rewritten as ONE per-order aggregate:
    EXISTS(other supplier)      <=> count(distinct supp)       >= 2
    NOT EXISTS(other late supp) <=> count(distinct late supp)  == 1
    (l1 itself is late, so its supplier is the one late supplier).
    Scale shape (r12, guide §2.4): ONE pass over lineitem⋈orders. A
    qualifying order has exactly one distinct late supplier, so every
    late line in it belongs to that supplier — the per-order aggregate
    can therefore carry the late supplier's key (max over the late
    lines, a one-element set) and its late-line count, and the old
    second lineitem pass (join back li.filter(is_late) ⋈ per_order —
    a second full scan + a SortMergeJoin on orderkey) collapses into
    two extra aggregate columns. numwait = sum of per-order late-line
    counts, identical row-for-row to counting the joined-back lines.
    supplier and nation broadcast; count(distinct) runs as a two-level
    hash aggregate with partial combine. The correlated self-join form
    would shuffle lineitem twice more and explode on multi-line
    orders; the aggregate form is O(|lineitem|).
    Reference parity: the engine has no correlated-subquery surface
    either — this is the flow-algebra composition of group/count +
    join (src/flow.rs group_by/join)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("is_late"),
        )
    )
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late_supp"),
        F.max(late_supp).alias("late_supp"),
        F.count(late_supp).alias("n_late_lines"),
    )
    sup = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(sup, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# -- Q9 (adapted): profit by nation and year -------------------------------

Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       year(o.o_orderdate) AS o_year,
       CAST(sum({_REV4_SQL.format(a="l.")}) AS BIGINT) AS profit_fp4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, year(o.o_orderdate)
"""


@register("q9_product_profit", oracle=Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted (no partsupp in TESTDATA → profit omits the
    supplycost term; the plan shape — a selective dim filter fanned
    across a 4-dim star join with a 2-key rollup — is intact).
    Scale: part (filtered '%red%'), supplier, and nation all broadcast,
    so lineitem's only exchange is the fact-fact join with orders on
    orderkey; the rollup is a hash aggregate with partial combine."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev4().cast("decimal(28,0)")).cast("long").alias("profit_fp4"))
    )


# -- Q2 (adapted): best supplier per part ----------------------------------

Q2_ORACLE = """
WITH sup AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
),
vol AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(sum(CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_fp2
  FROM lineitem l JOIN sup ON sup.s_suppkey = l.l_suppkey
  GROUP BY l.l_partkey, l.l_suppkey
),
best AS (
  SELECT v.l_partkey, v.l_suppkey, v.qty_fp2,
         row_number() OVER (PARTITION BY v.l_partkey ORDER BY v.qty_fp2 DESC, v.l_suppkey ASC) AS rn
  FROM vol v
)
SELECT p.p_partkey, p.p_name, s.s_name, s.n_name, s.s_acctbal, b.qty_fp2 AS supplied_qty_fp2
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size = 3
JOIN sup s ON s.s_suppkey = b.l_suppkey
WHERE b.rn = 1
"""


@register("q2_best_supplier", oracle=Q2_ORACLE)
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted (no partsupp → "minimum supply cost" becomes "maximum
    shipped quantity" from lineitem; the shape — a per-part correlated
    best-supplier pick inside a region-filtered supplier set — is
    intact). Scale: the supplier⋈nation⋈region dim closure broadcasts;
    lineitem aggregates once on (partkey, suppkey); the per-part argmax
    is a max_by hash aggregate, NOT a row_number window (no sort; the
    oracle's window is only a formulation difference); part broadcasts
    into the final join."""
    sup = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    vol = (
        load_table(spark, sf_dir, "lineitem")
        .join(sup.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity").cast("decimal(28,0)")).cast("long").alias("qty_fp2"))
    )
    # per-part argmax with (qty desc, suppkey asc) determinism: max_by on
    # (qty, -suppkey) — single hash aggregate
    best = vol.groupBy("l_partkey").agg(
        F.max_by(
            F.struct(F.col("l_suppkey"), F.col("qty_fp2")),
            F.struct(F.col("qty_fp2"), (-F.col("l_suppkey")).alias("_ns")),
        ).alias("_b")
    ).select("l_partkey", F.col("_b.l_suppkey").alias("l_suppkey"), F.col("_b.qty_fp2").alias("qty_fp2"))
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_size") == 3).select("p_partkey", "p_name")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(sup, best.l_suppkey == sup.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", F.col("qty_fp2").alias("supplied_qty_fp2"))
    )


# -- Q11 (adapted): important stock share ----------------------------------

Q11_FRACTION_DEN = 1000  # share threshold = 1/1000 of total value

Q11_ORACLE = f"""
WITH nsup AS (
  SELECT s.s_suppkey FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
),
pv AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  * CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
           AS value_fp4
  FROM lineitem l JOIN nsup ON nsup.s_suppkey = l.l_suppkey
  GROUP BY l.l_partkey
),
tot AS (SELECT CAST(sum(value_fp4) AS HUGEINT) AS total FROM pv)
SELECT pv.l_partkey AS p_partkey, pv.value_fp4
FROM pv, tot
WHERE pv.value_fp4 * {Q11_FRACTION_DEN} > tot.total
"""


@register("q11_important_stock", oracle=Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted (no partsupp → "stock value" is shipped
    extendedprice×quantity from lineitem; the shape — a grouped value
    rollup filtered against a scalar share-of-total — is intact).
    Scale: the national supplier set broadcasts; lineitem aggregates
    once on partkey; the scalar total is a one-row aggregate broadcast
    back over the per-part rollup (no second scan of lineitem)."""
    nsup = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = (
        load_table(spark, sf_dir, "lineitem")
        .join(nsup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum((_cents("l_extendedprice") * _cents("l_quantity")).cast("decimal(28,0)"))
            .cast("long")
            .alias("value_fp4")
        )
    )
    tot = pv.agg(F.sum(F.col("value_fp4").cast("decimal(28,0)")).alias("_total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        # share > 1/1000 as the cross-multiplied integer form (exact;
        # value·0.001 in doubles can straddle a part sitting ON the line)
        .filter(F.col("value_fp4").cast("decimal(28,0)") * Q11_FRACTION_DEN > F.col("_total"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_fp4")
    )


# -- Q20 (adapted): suppliers with excess shipments ------------------------

Q20_QTY_MIN_FP2 = 30000  # 300.00 in integer cents

Q20_ORACLE = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
q20qty AS (
  SELECT l.l_suppkey,
         CAST(sum(CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_fp2
  FROM lineitem l JOIN bp ON bp.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_5'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM q20qty WHERE qty_fp2 > {Q20_QTY_MIN_FP2})
"""


@register("q20_excess_suppliers", oracle=Q20_ORACLE)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adapted (no partsupp → "excess available stock" becomes
    excess SHIPPED quantity of the name-filtered parts in the window;
    the nested semi-join chain — parts → qualifying supplier set →
    nation-filtered suppliers — is intact). Scale: the part filter
    broadcasts into the lineitem scan-side join, the qualifying
    supplier set is tiny and drives a broadcast LEFT SEMI join, nation
    broadcasts; lineitem is touched once."""
    bp = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%")).select("p_partkey")
    )
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(bp, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_cents("l_quantity").cast("decimal(28,0)")).cast("long").alias("qty_fp2"))
        .filter(F.col("qty_fp2") > Q20_QTY_MIN_FP2)
        .select("l_suppkey")
    )
    nat = F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5"))
    return (
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qty), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
