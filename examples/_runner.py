"""Shared two-epoch IVM demo harness for the runnable examples.

Each example mirrors one of the reference's shipped binaries
(/root/reference/examples/*): subscribe to the event log, run the
dataflow, and materialize the continuously-updated result into SQLite
with the offsets committed in the SAME transaction (the reference's
exactly-once contract, src/runner.rs:81-123, src/db/mod.rs:16-53).

The demo plays the lifecycle in two epochs: a CATCH-UP pass over the
first 80% of the log (by event_id, the lamport stand-in), then the
remaining events "arrive" and a second epoch applies ONLY the net
delta — the rows printed at the end reflect the full log, but the
second transaction shipped far fewer rows than the table holds. That
delta-not-resend behavior is the reference's core IVM property.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from actyxos_data_flow_spark.session import get_spark  # noqa: E402
from actyxos_data_flow_spark.sinks import SnapshotMirror, SqliteSink, write_snapshot  # noqa: E402
from actyxos_data_flow_spark.sources import load_table  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.001"


def run_two_epochs(table, build_view, sf_dir=DEFAULT_SF, db_path=None, spark=None):
    """Run the catch-up epoch then the live epoch; return (sink, stats).

    ``build_view(events_df) -> DataFrame`` must produce exactly the
    table's written columns. Offsets key 'events' carries the max
    event_id reflected — the OffsetMap of this single-source demo."""
    own_spark = spark is None
    if spark is None:
        spark = get_spark("examples")
    if db_path is None:
        db_path = os.path.join(".scratch", "examples", f"{table.name}.sqlite")
        os.makedirs(os.path.dirname(db_path), exist_ok=True)
        if os.path.exists(db_path):
            os.remove(db_path)
    sink = SqliteSink(db_path)
    sink.ensure(table)
    mirror = SnapshotMirror(spark, db_path + ".mirror")
    events = load_table(spark, sf_dir, "events")
    hi = int(events.agg(F.max("event_id")).first()[0])
    cut = int(hi * 0.8)
    stats = []
    for label, upto in (("catch-up", cut), ("live", hi)):
        view = build_view(events.filter(F.col("event_id") <= upto))
        applied = write_snapshot(spark, sink, table, view, {"events": upto}, mirror)
        stats.append(
            {
                "epoch": label,
                "offset": upto,
                "delta_rows_applied": applied,
                "table_rows": len(sink.rows(table)),
                "offsets": sink.read_offsets(table),
            }
        )
    if own_spark:
        for s in stats:
            print(s)
        head = sink.rows(table)[:10]
        print(f"first rows of {table.name}: {head}")
    return sink, stats
