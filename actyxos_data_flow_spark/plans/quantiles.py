"""HDR quantile-sketch query: per-returnflag price percentiles from
the bucket model vs the exact order statistics, with the 2^-k relative
error bound checked as an INTEGER comparison inside the hashed output
(same accuracy-in-the-hash posture as cms_heavy_hitters and
sketch_hll_cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import quantiles as Q
from ..sources import load_table
from . import register

QUANTS = [0.5, 0.9, 0.99]

# l_extendedprice is a 2dp money double: *100 + round-to-integer is the
# exact cents bigint on both engines (no half-cent values exist)
_CENTS_SQL = """
  SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
  FROM lineitem
"""

HDR_ORACLE = f"""
WITH {Q.hdr_oracle_cte(_CENTS_SQL)},
qdist AS (SELECT g, v, count(*) AS c FROM qvals GROUP BY 1, 2),
qdcum AS (
  SELECT g, v,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM qdist
),
qexact AS (
  SELECT g, q, min(v) AS exact_v
  FROM qdcum CROSS JOIN (SELECT CAST(q AS DOUBLE) AS q
                         FROM (VALUES (0.5), (0.9), (0.99)) v(q)) qv
  WHERE cum >= ceil(q * n)
  GROUP BY 1, 2
)
SELECT h.g AS l_returnflag, h.q, h.n,
       round(x.exact_v / 100.0, 2) AS exact_price,
       round(h.est / 100.0, 2) AS est_price,
       (abs(x.exact_v - h.est) * 1000000) // x.exact_v AS rel_err_fp6,
       (x.exact_v - h.est) * {1 << Q.HDR_K} <= x.exact_v AS within_bound
FROM hq h JOIN qexact x ON x.g = h.g AND x.q = h.q
"""


@register("sketch_hdr_quantiles", oracle=HDR_ORACLE)
def sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice per return flag, answered from
    the HDR bucket model (<= ~4k counters per group — the window runs
    over the MODEL, never the data) and checked against the exact
    order statistics. est <= exact always (bucket lower bound); the
    within_bound column proves the 2^-5 = 3.125% relative guarantee
    with pure integer arithmetic. The exact side (a data-sized sort)
    appears only as ground truth — the CMS/HLL posture."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    sk = Q.hdr_build(cents, "v", "g")
    est = Q.hdr_quantiles(sk, QUANTS, "g")
    # exact r-th smallest per (g, q): cumulative counts over the exact
    # value distribution (ground truth only)
    dist = cents.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = dist.withColumn("_cum", F.sum("c").over(w)).withColumn(
        "_n", F.sum("c").over(W.partitionBy("g"))
    )
    qs = F.explode(F.array(*[F.lit(q) for q in QUANTS])).alias("q")
    exact = (
        cum.select("g", "v", "_cum", "_n", qs)
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy("g", "q")
        .agg(F.min("v").alias("exact_v"))
    )
    bound = (F.col("exact_v") - F.col("est")) * F.lit(1 << Q.HDR_K) <= F.col("exact_v")
    return est.join(exact, ["g", "q"]).select(
        F.col("g").alias("l_returnflag"),
        "q",
        "n",
        F.round(F.col("exact_v") / 100.0, 2).alias("exact_price"),
        F.round(F.col("est") / 100.0, 2).alias("est_price"),
        F.expr("(abs(exact_v - est) * 1000000) DIV exact_v").alias("rel_err_fp6"),
        bound.alias("within_bound"),
    )
