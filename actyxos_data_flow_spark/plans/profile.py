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
       round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6) AS null_frac,
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
