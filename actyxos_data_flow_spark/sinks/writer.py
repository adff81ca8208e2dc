"""Spark ↔ sink glue: turn delta DataFrames into sink batches and close
the IVM loop (view recompute → snapshot diff → transactional apply).

The NET delta of a materialized view scales with the view's churn, not
with the input (K2 consolidation runs distributed first), so collecting
it to the driver for a single-writer store is the correct topology —
the reference does exactly this through an in-process channel
(/root/reference/src/runner.rs:113-122). For a multi-writer JDBC target
the same batches would be applied per-partition via foreachPartition.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from ..delta import DELTA_COL, consolidate, snapshot_diff
from .spec import DbTable
from .sqlite import SqliteSink


def deltas_to_rows(delta_df: DataFrame, table: DbTable) -> list[tuple[tuple, int]]:
    """Collect a consolidated delta DataFrame as (row_values, mult)
    pairs ordered by the table's written columns."""
    cols = [c.name for c in table.written_columns]
    rows = consolidate(delta_df).select(*cols, DELTA_COL).collect()
    return [(tuple(r[c] for c in cols), r[DELTA_COL]) for r in rows]


def write_snapshot(
    spark: SparkSession,
    sink: SqliteSink,
    table: DbTable,
    new_snapshot: DataFrame,
    offsets: Mapping[str, int],
) -> int:
    """Materialize ``new_snapshot`` into ``table`` by diffing against the
    rows currently stored, applying only the ±delta in one transaction
    with ``offsets``. Returns the number of delta rows applied.

    This is the batch/foreachBatch materialization path: recompute the
    view, diff snapshots (exact for arbitrary DAGs), ship the net
    change. Repeated calls with the same input are idempotent (empty
    diff), which is what makes micro-batch retries exactly-once."""
    cols = [c.name for c in table.written_columns]
    stored = sink.rows(table)
    old = spark.createDataFrame(stored, schema=new_snapshot.select(*cols).schema)
    delta = snapshot_diff(old, new_snapshot.select(*cols))
    batch = [
        (tuple(r[c] for c in cols), r[DELTA_COL])
        for r in delta.collect()
    ]
    sink.advance_offsets({table: batch}, dict(offsets))
    return len(batch)
