"""Structured Streaming drive: readStream → foreachBatch → exactly-once
SQL materialization.

Micro-batch = the reference's epoch (/root/reference/src/machine.rs:169-181):
each trigger stages its batch into the log mirror (idempotently, keyed
by batch_id — a retried batch overwrites its own directory), recomputes
the view over the mirrored log, and applies the net delta + offsets in
one sink transaction. This is the reference's offsets-in-transaction
protocol (/root/reference/src/runner.rs:81-123) riding on Spark's
replayable-source + idempotent-sink contract.

The staging mirror is what a Delta/Kafka-backed deployment gets for
free (the log is already durable + replayable); with a parquet file
source we materialize it explicitly.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import DbTable, SqliteSink
from ..sinks.writer import write_snapshot

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


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    view_fn: ViewFn,
    sink: SqliteSink,
    table: DbTable,
    stage_dir: str,
    checkpoint_dir: str,
    source_name: str = "events",
    offset_col: str = "event_id",
) -> None:
    """Drain the stream with an availableNow trigger, materializing the
    view into ``table`` exactly-once per micro-batch."""
    sink.ensure(table)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent stage: a retried batch rewrites its own directory
        batch_df.write.mode("overwrite").parquet(
            os.path.join(stage_dir, f"batch={batch_id}")
        )
        log = spark.read.option("recursiveFileLookup", "true").parquet(stage_dir)
        snapshot = view_fn(log)
        upto = log.agg(F.max(offset_col)).first()[0]
        write_snapshot(spark, sink, table, snapshot, {source_name: upto})

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
