"""Count-min sketch query: heavy-hitter estimates vs exact counts,
with the DuckDB oracle rebuilding the sketch cell-for-cell (the
one-sided error — est ≥ exact, bounded overshoot — is IN the hashed
output, so the sketch's accuracy contract is itself oracle-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import cms as C
from ..operators.retrieval import _tokens
from ..sources import load_table
from . import register

HH_TOP = 10

_D, _W = C.CMS_D, C.CMS_W

CMS_HH_ORACLE = f"""
WITH ctok AS (
  SELECT t AS term FROM (
    SELECT unnest(string_split(lower(coalesce(text, '')), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
cex AS (SELECT term, count(*) AS cnt FROM ctok GROUP BY 1),
chash AS (
  SELECT term,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(term), 17, 15))::BIGINT AS p2
  FROM cex
),
crows AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),
ccell AS (
  SELECT r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket, sum(e.cnt) AS c
  FROM cex e JOIN chash h USING (term) CROSS JOIN crows r
  GROUP BY 1, 2
),
ccand AS (
  SELECT term, cnt FROM (
    SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
    FROM cex
  ) WHERE rank <= {HH_TOP}
),
cest AS (
  SELECT d.term, min(s.c) AS est
  FROM (SELECT h.term, r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket
        FROM chash h CROSS JOIN crows r
        WHERE h.term IN (SELECT term FROM ccand)) d
  JOIN ccell s ON s.row = d.row AND s.bucket = d.bucket
  GROUP BY d.term
)
SELECT c.term, c.cnt AS exact_cnt, CAST(e.est AS BIGINT) AS est,
       CAST(e.est - c.cnt AS BIGINT) AS overshoot,
       row_number() OVER (ORDER BY c.cnt DESC, c.term ASC) AS rank
FROM ccand c JOIN cest e USING (term)
"""


@register("cms_heavy_hitters", oracle=CMS_HH_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=64 — a 2 KB model) built in one pass
    over all document tokens; the top-10 exact heavy hitters are then
    estimated from the sketch. est ≥ exact always (one-sided error);
    the hashed overshoot column IS the accuracy report. Both the build
    and the probe are model-sized aggregates — the vocabulary-sized
    exact table appears here only to furnish the ground truth."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(_tokens("text")).alias("term"))
    sketch = C.cms_build(tokens)
    exact = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    cand = exact.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(HH_TOP)
    est = C.cms_estimate(sketch, cand.select("term"))
    w = W.orderBy(F.col("exact_cnt").desc(), F.col("term").asc())
    return (
        cand.join(est, "term")
        .select(
            "term",
            F.col("cnt").alias("exact_cnt"),
            F.col("est").cast("long").alias("est"),
            (F.col("est") - F.col("cnt")).cast("long").alias("overshoot"),
        )
        .withColumn("rank", F.row_number().over(w))
    )
