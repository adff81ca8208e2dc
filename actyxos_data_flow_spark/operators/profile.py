"""Dataset profiling for pipeline data-quality gates: per-column row /
null / distinct counts and numeric ranges in ONE pass over the table —
the pre-training "know your corpus" report (Deequ/TFDV shape).

Scale notes: all stats ride a single wide aggregate. With ``exact=True``
each count(distinct) Spark-expands into its own aggregation path — fine
to a few dozen columns, and required for the DuckDB oracle gate; at
100 TB flip ``exact=False`` for one-pass HLL sketches
(approx_count_distinct, default rsd 5%) with no Expand and one shuffle
of tiny partial sketches. Null/min/max/count are always single-pass
partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMERIC_TYPES = ("int", "bigint", "double", "float", "smallint", "tinyint")


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    null_frac_fp6 — (nulls·10^6) DIV rows, an exact fp6 integer —
    n_distinct, min_num, max_num); min/max are NULL for
    non-numeric columns (cross-engine string/date rendering is not
    hash-stable, numeric is)."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        if exact:
            aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_dist_{c}"))
        if dtypes[c] in NUMERIC_TYPES:
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nulls_{c}").alias("n_nulls"),
            F.expr(f"(_nulls_{c} * 1000000) DIV _n").alias("null_frac_fp6"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if dtypes[c] in NUMERIC_TYPES else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"_max_{c}") if dtypes[c] in NUMERIC_TYPES else F.lit(None).cast("double")).alias("max_num"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
