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
