"""Signed-multiplicity (retraction) layer — what makes this an IVM engine.

The reference's every operator output is a stream of deltas
``(record, multiplicity: isize)`` — +insert/−delete — consolidated per
epoch into a canonical net-effect batch before hitting the database
(/root/reference/src/flow.rs:129-146, /root/reference/src/coll.rs:25-101).

Spark-first equivalent:

- A *delta DataFrame* is any DataFrame with an integer ``delta`` column.
- :func:`consolidate` = the reference's ``Coll`` compaction
  (/root/reference/src/coll.rs:89-101): group identical records, sum
  multiplicities, drop zero-sum rows. One hash aggregate — the same
  physical shape at 60k rows or 100 TB.
- :func:`snapshot_diff` computes the delta set between two materialized
  results (old → new). This is how batch mode emits retractions: rather
  than maintaining per-operator incremental state (the differential-
  dataflow substrate), we recompute the view and diff snapshots — exact
  for arbitrary DAGs, embarrassingly parallel, and on a cluster the diff
  co-partitions both sides on the full-row hash so the join is
  shuffle-balanced. With Delta-CDF-style sources the diff narrows to
  changed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA_COL = "delta"


def with_delta(df: DataFrame, mult: int = 1) -> DataFrame:
    """Lift a materialized DataFrame into delta space (all rows ×mult)."""
    if DELTA_COL in df.columns:
        return df.withColumn(DELTA_COL, F.col(DELTA_COL) * F.lit(mult))
    return df.withColumn(DELTA_COL, F.lit(mult))


def consolidate(df: DataFrame) -> DataFrame:
    """K2 — net-effect compaction: sum multiplicities per distinct record,
    drop rows netting to zero (/root/reference/src/coll.rs:89-101)."""
    if DELTA_COL not in df.columns:
        df = with_delta(df)
    cols = [c for c in df.columns if c != DELTA_COL]
    return (
        df.groupBy(*cols)
        .agg(F.sum(DELTA_COL).cast("long").alias(DELTA_COL))
        .filter(F.col(DELTA_COL) != 0)
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Delta set turning ``old`` into ``new``: rows of ``new`` not in
    ``old`` get +n, rows of ``old`` not in ``new`` get −n (multiset
    semantics, counted per distinct record — one aggregate per side plus
    a full-outer co-partitioned join on the record columns)."""
    cols = old.columns
    if cols != new.columns:
        raise ValueError(f"snapshot schemas differ: {cols} vs {new.columns}")
    oc = old.groupBy(*cols).agg(F.count(F.lit(1)).alias("_old_n"))
    nc = new.groupBy(*cols).agg(F.count(F.lit(1)).alias("_new_n"))
    joined = oc.join(nc, on=cols, how="full_outer").select(
        *cols,
        (F.coalesce(F.col("_new_n"), F.lit(0)) - F.coalesce(F.col("_old_n"), F.lit(0))).cast("long").alias(DELTA_COL),
    )
    return joined.filter(F.col(DELTA_COL) != 0)


def apply_delta(snapshot: DataFrame, delta: DataFrame) -> DataFrame:
    """Apply a consolidated delta to a snapshot → next snapshot
    (inverse of :func:`snapshot_diff`; used by tests to close the loop).
    A valid application leaves no negative multiplicities; negatives are
    dropped (the reference panics — src/flow.rs:286-321 monotonic ops)."""
    cols = [c for c in delta.columns if c != DELTA_COL]
    merged = consolidate(with_delta(snapshot).unionByName(delta))
    expanded = merged.filter(F.col(DELTA_COL) > 0).select(
        *cols, F.explode(F.array_repeat(F.lit(1), F.col(DELTA_COL).cast("int"))).alias("_one")
    )
    return expanded.drop("_one")
