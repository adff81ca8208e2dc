"""Structured Streaming drive: readStream → foreachBatch → exactly-once
SQL materialization, in the reference's three phases.

Micro-batch = the reference's epoch (/root/reference/src/machine.rs:169-181):
each trigger stages its batch into the log mirror (idempotently, keyed
by batch_id — a retried batch overwrites its own directory), recomputes
the view(s) over the mirrored log, and applies the net delta + offsets
in one sink transaction. This is the reference's offsets-in-transaction
protocol (/root/reference/src/runner.rs:81-123) riding on Spark's
replayable-source + idempotent-sink contract.

Phases (reference runner, /root/reference/src/runner.rs:169-173):

- replay + catch-up → :func:`run_available_now` (``availableNow``
  drains everything the source currently has, then stops);
- live → :func:`run_live` (``processingTime`` trigger = the reference's
  5-second tick stream, /root/reference/src/runner.rs:322-355; Spark
  fires a micro-batch per tick only when the source reports progress,
  which is exactly the reference's flush-only-on-progress rule).

The staging mirror is what a Delta/Kafka-backed deployment gets for
free (the log is already durable + replayable); with a parquet file
source we materialize it explicitly.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sinks import DbapiSink, DbTable, Union
from ..sinks.writer import SnapshotMirror, write_snapshots

ViewFn = Callable[[DataFrame], DataFrame]


def events_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over an events directory; one file ≈ one
    micro-batch with max_files_per_trigger=1 (S4: epoch boundary)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _foreach_batch_handler(
    spark: SparkSession,
    views: Sequence[tuple[DbTable, ViewFn]],
    sink: DbapiSink,
    stage_dir: str,
    mirror: SnapshotMirror,
    source_name: str,
    offset_col: str,
    offsets_table: str,
):
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent stage: a retried batch rewrites its own directory
        batch_df.write.mode("overwrite").parquet(
            os.path.join(stage_dir, f"batch={batch_id}")
        )
        log = spark.read.option("recursiveFileLookup", "true").parquet(stage_dir)
        upto = log.agg(F.max(offset_col)).first()[0]
        if upto is None:
            # staged log still empty (first batch delivered no rows):
            # nothing to materialize, and upserting a NULL offset would
            # violate the offsets table's NOT NULL constraint
            return
        write_snapshots(
            spark,
            sink,
            [(t, fn(log)) for t, fn in views],
            {source_name: upto},
            mirror,
            offsets_table=offsets_table,
        )

    return handle


def _normalize_views(
    view_fn: ViewFn | Sequence[tuple[DbTable, ViewFn]], table: DbTable | None
) -> tuple[list[tuple[DbTable, ViewFn]], DbTable | Union]:
    if table is not None:
        views = [(table, view_fn)]
    else:
        views = list(view_fn)
    spec: DbTable | Union = (
        views[0][0] if len(views) == 1 else Union(tuple(t for t, _ in views))
    )
    return views, spec


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    view_fn: ViewFn | Sequence[tuple[DbTable, ViewFn]],
    sink: DbapiSink,
    table: DbTable | None = None,
    stage_dir: str = "",
    checkpoint_dir: str = "",
    source_name: str = "events",
    offset_col: str = "event_id",
    mirror_dir: str | None = None,
) -> None:
    """Drain the stream with an availableNow trigger (replay+catch-up
    phases), materializing the view(s) into their tables exactly-once
    per micro-batch. ``view_fn`` may be a single function (with
    ``table``) or a sequence of (table, view_fn) pairs sharing one
    transaction + offsets table (Union contract)."""
    views, spec = _normalize_views(view_fn, table)
    sink.ensure(spec)
    mirror = SnapshotMirror(spark, mirror_dir or tempfile.mkdtemp(prefix="adf_mirror_"))
    handle = _foreach_batch_handler(
        spark, views, sink, stage_dir, mirror, source_name, offset_col, spec.offsets_table
    )
    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_live(
    spark: SparkSession,
    stream_df: DataFrame,
    view_fn: ViewFn | Sequence[tuple[DbTable, ViewFn]],
    sink: DbapiSink,
    table: DbTable | None = None,
    stage_dir: str = "",
    checkpoint_dir: str = "",
    source_name: str = "events",
    offset_col: str = "event_id",
    mirror_dir: str | None = None,
    tick: str = "5 seconds",
) -> StreamingQuery:
    """Live phase (/root/reference/src/runner.rs:322-355): keep the
    query running, flushing deltas on a periodic tick. ``processingTime``
    is the tick stream; Spark only invokes foreachBatch when the source
    made progress, matching the reference's flush-only-on-progress.
    Returns the running query — caller stops it (the reference's live
    loop also runs until torn down). Restart with the same checkpoint
    resumes from the last committed batch; the sink transaction makes
    replayed batches idempotent."""
    views, spec = _normalize_views(view_fn, table)
    sink.ensure(spec)
    mirror = SnapshotMirror(spark, mirror_dir or tempfile.mkdtemp(prefix="adf_mirror_"))
    handle = _foreach_batch_handler(
        spark, views, sink, stage_dir, mirror, source_name, offset_col, spec.offsets_table
    )
    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=tick)
        .start()
    )
