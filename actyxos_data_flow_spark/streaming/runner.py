"""Batch-incremental runner: the reference's catch-up loop, Spark-first.

Reference behavior transposed (/root/reference/src/runner.rs:151-358):
events are consumed in lamport order; every ``events_per_txn`` events
the accumulated deltas are shipped to the DB in one transaction with
the offsets they reflect; on restart the stored offsets bound what to
skip. Our epoch = one offset-bounded prefix of the log; instead of
maintaining differential operator state we recompute the view on the
prefix and diff against the sink (exact for arbitrary DAGs — SURVEY.md
§4). The reference's ``Stateless``/``Stateful`` marker
(/root/reference/src/flow.rs:160-177) decides whether restart must
replay history; recompute-from-log subsumes replay, and bounded
look-back (``Flow::new_limited``, /root/reference/src/flow.rs:103-123)
becomes a source-side timestamp filter.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import DbTable, SqliteSink
from ..sinks.writer import write_snapshot

ViewFn = Callable[[DataFrame], DataFrame]


class IncrementalRunner:
    """Materialize ``view_fn(events ≤ offsets)`` into ``table`` batch by
    batch with exactly-once resume from the sink's offsets table."""

    def __init__(
        self,
        spark: SparkSession,
        sink: SqliteSink,
        table: DbTable,
        view_fn: ViewFn,
        source_name: str = "events",
        offset_col: str = "event_id",
        lookback_filter: F.Column | None = None,
    ):
        self.spark = spark
        self.sink = sink
        self.table = table
        self.view_fn = view_fn
        self.source_name = source_name
        self.offset_col = offset_col
        # S2/new_limited: restart optimization — only events passing this
        # predicate participate in recompute (bounded look-back horizon).
        self.lookback_filter = lookback_filter
        sink.ensure(table)

    def resume_offset(self) -> int:
        """Offset already reflected in the sink (−1 = nothing yet)."""
        return self.sink.read_offsets(self.table).get(self.source_name, -1)

    def _bounded(self, events: DataFrame, upto: int) -> DataFrame:
        df = events.filter(F.col(self.offset_col) <= upto)
        if self.lookback_filter is not None:
            df = df.filter(self.lookback_filter)
        return df

    def run_batch(self, events: DataFrame, upto: int) -> int:
        """One epoch: recompute on the prefix ≤ upto, apply net delta +
        offsets transactionally. Idempotent (retry ⇒ empty diff)."""
        snapshot = self.view_fn(self._bounded(events, upto))
        return write_snapshot(
            self.spark, self.sink, self.table, snapshot, {self.source_name: upto}
        )

    def catch_up(self, events: DataFrame, events_per_txn: int = 1000) -> list[int]:
        """Process everything beyond the stored offsets in commit units
        of ``events_per_txn`` (reference default 1,000 —
        /root/reference/examples/machine-dashboard/main.rs:44). Returns
        the per-batch applied delta counts."""
        from pyspark.sql import Window as W

        start = self.resume_offset()
        pending = events.filter(F.col(self.offset_col) > start).select(self.offset_col)
        n = pending.count()
        if n == 0:
            return []
        # batch boundaries: every events_per_txn-th offset. Only the
        # boundary rows (one per future transaction) reach the driver;
        # the rank runs distributed. The global-order window sorts just
        # the projected offset column.
        w = W.orderBy(self.offset_col)
        bounds_df = (
            pending.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") % events_per_txn == 0) | (F.col("_rn") == n))
            .select(self.offset_col)
            .orderBy(self.offset_col)
        )
        bounds: Sequence[int] = [r[0] for r in bounds_df.collect()]
        return [self.run_batch(events, b) for b in bounds]
