"""Sink layer: exactly-once materialization of delta streams into SQL.

The reference materializes continuously-updated views as rows in an
external SQL database with exactly-once delivery: every batch of deltas
is applied in ONE transaction together with an upsert of the per-source
offsets consumed, so a restart resumes from the offsets the data
actually reflects (/root/reference/src/runner.rs:81-123,
/root/reference/src/db/mod.rs:361-394).

Spark-first shape: the engine computes a consolidated net-delta batch
(delta.consolidate / delta.snapshot_diff); the sink applies it
transactionally. For SQLite — an inherently single-writer store — the
apply runs on the driver over the collected NET delta (small by
construction: it scales with the view's churn, not the input). A
multi-writer JDBC target would instead apply per-partition inside
``foreachPartition`` with the same offsets-in-transaction protocol.
"""

from .dbapi import DbapiSink
from .dialect import Dialect, MssqlDialect, PostgresDialect, SqliteDialect
from .distributed import DistributedApplier
from .mssql import MssqlSink
from .postgres import PostgresSink
from .spec import DbColumn, DbTable, Union
from .sqlite import SqliteSink
from .writer import SnapshotMirror, deltas_to_rows, write_snapshot, write_snapshots

__all__ = [
    "DbColumn",
    "DbTable",
    "Union",
    "DbapiSink",
    "Dialect",
    "SqliteDialect",
    "PostgresDialect",
    "MssqlDialect",
    "DistributedApplier",
    "SqliteSink",
    "PostgresSink",
    "MssqlSink",
    "SnapshotMirror",
    "deltas_to_rows",
    "write_snapshot",
    "write_snapshots",
]
