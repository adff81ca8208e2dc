"""HDR-histogram quantile sketch: mergeable percentile estimation with
a bounded RELATIVE error — and, unlike t-digest/DDSketch, every step
here is integer-exact, so the sketch is bit-reproducible across
engines and layouts.

This completes the sketch trio (operators/cms.py = frequency,
operators/hll.py = cardinality, this = quantiles): at 100 TB "p99
latency / price / doc length per shard" cannot sort the data, and
Spark's approx_percentile keeps its internal state opaque. Here the
bucket TABLE is the public model — log-linear buckets keyed by
(shift, top) where ``top`` is the leading 1+k bits of the value and
``shift`` the bits dropped below them. Counts merge by plain sum;
bucket id is monotone in the value, so quantiles read off a
model-sized cumulative sum. The bucket's lower bound ``top << shift``
is the estimate: always <= the true quantile, within a factor
2^-k of it (k=5 -> 3.125%), and the bound check is an INTEGER
comparison gated into the output.

HdrHistogram (Gil Tene) is the public prior; the (bit_length, top
bits) bucketing is its core idea. The reference repo has no sketch
surface; builder-brief extension (same posture as cms.py/hll.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

HDR_K = 5  # mantissa bits kept below the leading 1: rel error <= 2^-5
_TOPW = 1 << (HDR_K + 1)  # bucket-id stride (64): bid = shift*64 + top


def hdr_build(
    values: DataFrame,
    value_col: str,
    *group_cols: str,
    k: int = HDR_K,
    weight_col: str | None = None,
) -> DataFrame:
    """The sketch build: one narrow projection + one map-side-combined
    count aggregate -> (group..., bid, c). At most ~64*64 buckets per
    group cross the shuffle per task regardless of row count; merging
    shard sketches is ``groupBy(bid).sum(c)``. Pass ``weight_col`` to
    add pre-aggregated counts in bulk (same contract as cms_build) —
    quantiles then answer over the weighted distribution."""
    stride = 1 << (k + 1)
    bid = F.expr(
        f"CAST(greatest(length(conv({value_col}, 10, 2)) - {1 + k}, 0) AS INT)"
        f" * {stride}"
        f" + shiftright({value_col},"
        f" CAST(greatest(length(conv({value_col}, 10, 2)) - {1 + k}, 0) AS INT))"
    )
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    return (
        values.select(*group_cols, bid.alias("bid"), wcol.alias("_w"))
        .groupBy(*group_cols, "bid")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def hdr_merge(*sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union bucket tables from disjoint shards; counts add, so the
    merged sketch is exactly the sketch of the union."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bid").agg(F.sum("c").alias("c"))


def hdr_quantiles(
    sketch: DataFrame, quantiles: list[float], *group_cols: str, k: int = HDR_K
) -> DataFrame:
    """Per-group quantile estimates from a bucket table: rank r =
    ceil(q*N); the estimate is the lower bound (top << shift) of the
    first bucket whose cumulative count reaches r — always <= the true
    r-th smallest value and within a 2^-k relative factor of it. The
    window runs over the MODEL (<= ~4k buckets per group), never the
    data. Output: (group..., q, n, est) with est in the value's units."""
    stride = 1 << (k + 1)
    w = W.partitionBy(*group_cols).orderBy("bid").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = sketch.withColumn("_cum", F.sum("c").over(w)).withColumn(
        "_n", F.sum("c").over(W.partitionBy(*group_cols))
    )
    qs = F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q")
    ranked = cum.select(*group_cols, "bid", "_cum", "_n", qs).filter(
        F.col("_cum") >= F.ceil(F.col("q") * F.col("_n"))
    )
    est = F.expr(f"CAST(shiftleft(bid % {stride}, CAST(bid DIV {stride} AS INT)) AS BIGINT)")
    return (
        ranked.groupBy(*group_cols, "q")
        .agg(F.min("bid").alias("bid"), F.first("_n").alias("n"))
        .select(*group_cols, "q", F.col("n").cast("long").alias("n"), est.alias("est"))
    )


def hdr_oracle_cte(
    value_sql: str,
    k: int = HDR_K,
    # q must be DOUBLE on the oracle side too: bare VALUES would type it
    # DECIMAL and print 0.50 where Spark prints 0.5 (hash mismatch)
    quantile_sql: str = "(SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) v(q)) qv",
) -> str:
    """DuckDB CTE chain replaying the sketch bucket-for-bucket:
    ``value_sql`` must yield (g, v) with v a positive BIGINT; produces
    relation ``hq`` with (g, q, n, est)."""
    stride = 1 << (k + 1)
    return f"""
qvals AS ({value_sql}),
qbid AS (
  SELECT g,
         CAST(greatest(length(bin(v)) - {1 + k}, 0) AS INT) * {stride}
           + (v >> CAST(greatest(length(bin(v)) - {1 + k}, 0) AS INT)) AS bid
  FROM qvals
),
qsk AS (SELECT g, bid, count(*) AS c FROM qbid GROUP BY 1, 2),
qcum AS (
  SELECT g, bid, c,
         sum(c) OVER (PARTITION BY g ORDER BY bid
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM qsk
),
hq AS (
  SELECT g, q, CAST(min(n) AS BIGINT) AS n,
         CAST(((min(bid) % {stride})::BIGINT << CAST(min(bid) // {stride} AS INT)) AS BIGINT) AS est
  FROM qcum CROSS JOIN {quantile_sql}
  WHERE cum >= ceil(q * n)
  GROUP BY 1, 2
)"""
