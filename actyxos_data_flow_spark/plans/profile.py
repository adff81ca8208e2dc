"""Dataset-profiling query (operators/profile.py) over ``orders`` —
oracle generated from the SAME column/type list so the two sides
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import profile as P
from ..sources import load_table
from . import register

# (column, is_numeric) — o_orderdate excluded from min/max (timestamp
# rendering is not cross-engine hash-stable; counts still profile it).
PROFILE_COLS: list[tuple[str, bool]] = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _col_sql(c: str, numeric: bool) -> str:
    minmax = (
        f"CAST(min({c}) AS DOUBLE) AS min_num, CAST(max({c}) AS DOUBLE) AS max_num"
        if numeric
        else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num"
    )
    return f"""
SELECT '{c}' AS col_name,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       (CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) AS null_frac_fp6,
       count(DISTINCT {c}) AS n_distinct,
       {minmax}
FROM orders"""


PROFILE_ORACLE = "\nUNION ALL\n".join(_col_sql(c, n) for c, n in PROFILE_COLS)


@register("profile_orders", oracle=PROFILE_ORACLE)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of orders (rows, nulls, exact
    distincts, numeric ranges). exact=True for the oracle gate;
    exact=False is the sketched 100 TB path (same schema)."""
    return P.profile(load_table(spark, sf_dir, "orders"), [c for c, _ in PROFILE_COLS], exact=True)


# -- k-anonymity privacy report --------------------------------------------

KANON_K = 5
KANON_CHAR_BUCKET = 100

KANON_ORACLE = f"""
WITH kq AS (
  SELECT lang, source, n_chars // {KANON_CHAR_BUCKET} AS size_bucket, count(*) AS class_n
  FROM documents GROUP BY 1, 2, 3
)
SELECT CAST(class_n AS BIGINT) AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_n) AS BIGINT) AS n_docs,
       class_n < {KANON_K} AS at_risk
FROM kq GROUP BY class_n
"""


@register("kanonymity_report", oracle=KANON_ORACLE)
def kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    n_chars/{b}): the equivalence-class size distribution, with classes
    below k={k} flagged ``at_risk`` — the docs whose quasi-identifiers
    make them re-identifiable and that a release would suppress or
    generalize. Two map-side-combined aggregates (class counts, then
    the size histogram); output is histogram-sized regardless of
    corpus size. Pure integers — nothing to round. The privacy sibling
    of `text_scrub_pii`: scrubbing removes direct identifiers, this
    measures the indirect ones.""".format(b=KANON_CHAR_BUCKET, k=KANON_K)
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars DIV {KANON_CHAR_BUCKET}").alias("size_bucket"),
    ).agg(F.count(F.lit(1)).alias("class_n"))
    return classes.groupBy("class_n").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_n").cast("long").alias("n_docs"),
    ).select(
        F.col("class_n").cast("long").alias("class_size"),
        "n_classes",
        "n_docs",
        (F.col("class_n") < KANON_K).alias("at_risk"),
    )
