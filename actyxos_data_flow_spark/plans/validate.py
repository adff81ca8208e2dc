"""Data-quality constraint report over the TPC-H facts + documents,
with a rule-by-rule UNION ALL oracle. The checklist is the engine's
Deequ-style verification surface (operators/validate.py): row-local
rules share one scan per table; unique/references cost one aggregate /
one anti-join each. The per-rule pass flag is in the hashed output, so
the data contract itself is oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.validate import Check, validation_report
from ..sources import load_table
from . import register

VALIDATE_ORACLE = """
WITH rep AS (
  SELECT 'lineitem' AS scope, 'in_range(l_quantity,1,50)' AS rule,
         CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         CAST(count(*) AS BIGINT) AS total
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'in_range(l_discount,0.0,0.1)',
         CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'in_set(l_returnflag)',
         CAST(sum(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'satisfies(positive_price)',
         CAST(sum(CASE WHEN NOT (l_extendedprice > 0) OR (l_extendedprice > 0) IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orders', 'not_null(o_custkey)',
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders', 'unique(o_orderkey)',
         (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT)
          FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
         (SELECT CAST(count(*) AS BIGINT) FROM orders)
  UNION ALL
  SELECT 'orders', 'references(o_custkey)',
         (SELECT CAST(count(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
         (SELECT CAST(count(*) AS BIGINT) FROM orders)
  UNION ALL
  SELECT 'documents', 'unique(doc_id)',
         (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT)
          FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id)),
         (SELECT CAST(count(*) AS BIGINT) FROM documents)
  UNION ALL
  SELECT 'documents', 'satisfies(n_chars_consistent)',
         CAST(sum(CASE WHEN NOT (length(text) = n_chars) OR (length(text) = n_chars) IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM documents
)
SELECT scope, rule, violations, total, violations = 0 AS pass FROM rep
"""


@register("quality_constraints_report", oracle=VALIDATE_ORACLE)
def quality_constraints_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nine declarative constraints over three tables, one violations
    row each. The four lineitem row-local rules compile into ONE
    conditional aggregate (single scan, no shuffle beyond the 1-row
    combine); unique is one hash aggregate of surplus counts;
    references is one anti-join (broadcast dim). The documents
    consistency rule cross-checks the n_chars column against the
    actual text length — the kind of redundancy constraint that
    catches silent upstream corruption at ingest."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    return validation_report(
        Check(li, "lineitem")
        .in_range("l_quantity", 1, 50)
        .in_range("l_discount", 0.0, 0.1)
        .in_set("l_returnflag", ["A", "N", "R"])
        .satisfies("positive_price", F.col("l_extendedprice") > 0),
        Check(orders, "orders")
        .not_null("o_custkey")
        .unique("o_orderkey")
        .references("o_custkey", customer, "c_custkey"),
        Check(docs, "documents")
        .unique("doc_id")
        .satisfies("n_chars_consistent", F.length(F.col("text")) == F.col("n_chars")),
    )
