"""HyperLogLog query: per-language distinct-token estimates vs exact
counts, with the DuckDB oracle replaying the sketch register-for-
register (the accuracy contract — estimate within 3 standard errors of
exact — is IN the hashed output, same posture as cms_heavy_hitters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import hll as H
from ..operators.retrieval import _tokens
from ..sources import load_table
from . import register

# 3 sigma at m=64: 3 * 1.04 / sqrt(64) = 0.39 relative error
_BOUND = 3 * 1.04 / 8.0

_ITEMS_SQL = """
  SELECT lang AS g, t AS item FROM (
    SELECT lang, unnest(string_split(lower(coalesce(text, '')), ' ')) AS t
    FROM documents
  ) WHERE t <> ''
"""

HLL_ORACLE = f"""
WITH {H.hll_oracle_cte(_ITEMS_SQL)},
hexact AS (SELECT g, count(DISTINCT item) AS exact_distinct FROM hitems GROUP BY 1)
SELECT x.g AS lang, x.exact_distinct, e.hll_est,
       round(abs(e.hll_est - x.exact_distinct), 6) AS abs_err,
       abs(e.hll_est - x.exact_distinct) <= {_BOUND!r} * x.exact_distinct AS within_3se
FROM hexact x JOIN hest e USING (g)
"""


_NDV_COLS = ["l_returnflag", "l_linestatus", "l_suppkey", "l_partkey", "l_orderkey"]

_NDV_ITEMS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS g, CAST({c} AS VARCHAR) AS item FROM lineitem WHERE {c} IS NOT NULL"
    for c in _NDV_COLS
)

NDV_ORACLE = f"""
WITH {H.hll_oracle_cte(_NDV_ITEMS_SQL)},
nexact AS (SELECT g, count(DISTINCT item) AS exact_ndv FROM hitems GROUP BY 1)
SELECT x.g AS column_name, x.exact_ndv, e.hll_est AS ndv_est,
       abs(e.hll_est - x.exact_ndv) <= {_BOUND!r} * x.exact_ndv AS within_3se
FROM nexact x JOIN hest e USING (g)
"""


@register("table_stats_ndv", oracle=NDV_ORACLE)
def table_stats_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column distinct-value counts (NDV) for five lineitem
    columns — the statistic every cost-based optimizer prices joins
    and aggregations with — estimated from one job: the columns
    unpivot to (column_name, value) rows and the HLL build aggregates
    them all at once (64 registers per column cross the shuffle,
    nothing else). The union plans as one column-pruned scan PER
    column (audit: every scan pushes its single-column ReadSchema),
    so total I/O equals one wide scan of exactly the probed columns. Only string/integer columns participate:
    integer-to-VARCHAR rendering is identical on both engines, while
    double rendering (scientific-notation thresholds) is not — a
    double column would need an explicit decimal rendering first.
    Paired with
    cms_join_cardinality this is the sketch-backed statistics surface
    a 100 TB catalog would maintain."""
    li = load_table(spark, sf_dir, "lineitem")
    stacked = None
    for c in _NDV_COLS:
        part = li.filter(F.col(c).isNotNull()).select(
            F.lit(c).alias("lang"), F.col(c).cast("string").alias("item")
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    regs = H.hll_registers(stacked, "item", "lang")
    est = H.hll_estimate(regs, "lang")
    exact = stacked.groupBy("lang").agg(F.countDistinct("item").alias("exact_ndv"))
    err = F.abs(F.col("hll_est") - F.col("exact_ndv"))
    return exact.join(est, "lang").select(
        F.col("lang").alias("column_name"),
        "exact_ndv",
        F.col("hll_est").alias("ndv_est"),
        (err <= F.lit(_BOUND) * F.col("exact_ndv")).alias("within_3se"),
    )


@register("sketch_hll_cardinality", oracle=HLL_ORACLE)
def sketch_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (m=64 — a 512-byte model per group) distinct-token
    estimate per language, checked against the exact answer. The
    sketch build is a narrow projection + map-side-combined max — at
    most 64 register rows per language cross the shuffle per task; the
    vocabulary-sized count(DISTINCT) appears only as ground truth
    (exactly the CMS posture). within_3se gates the accuracy contract
    into the value hash; linear-counting small-range correction is
    exercised by low-cardinality languages when present."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("lang", F.explode(_tokens("text")).alias("item"))
    regs = H.hll_registers(tokens, "item", "lang")
    est = H.hll_estimate(regs, "lang")
    exact = tokens.groupBy("lang").agg(
        F.countDistinct("item").alias("exact_distinct")
    )
    err = F.abs(F.col("hll_est") - F.col("exact_distinct"))
    return exact.join(est, "lang").select(
        "lang",
        "exact_distinct",
        "hll_est",
        F.round(err, 6).alias("abs_err"),
        (err <= F.lit(_BOUND) * F.col("exact_distinct")).alias("within_3se"),
    )
