"""Transactional SQLite sink (K3): the DB-API core + SQLite dialect.

Replicates the delivery contract of the reference's SQLite driver
(/root/reference/src/db/sqlite.rs:37-124 init/migration, :211-269
write); the shared algorithm lives in :mod:`.dbapi`, the SQL shapes in
:mod:`.dialect`. WAL journal mode for concurrent readers.

SQLite is single-writer, so the apply runs wherever the connection
lives (the Spark driver in our runner). The same core drives the
PostgreSQL (:mod:`.postgres`) and MSSQL (:mod:`.mssql`) sinks.
"""

from __future__ import annotations

import sqlite3

from .dbapi import MIRROR_TABLE, VERSIONS_TABLE, DbapiSink
from .dialect import SqliteDialect

__all__ = ["SqliteSink", "VERSIONS_TABLE", "MIRROR_TABLE"]


class SqliteSink(DbapiSink):
    def __init__(self, path: str = ":memory:"):
        # check_same_thread off: foreachBatch handlers run on a worker
        # thread; batches are serialized so single-writer safety holds.
        conn = sqlite3.connect(path, check_same_thread=False)
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute("PRAGMA synchronous=NORMAL")
        super().__init__(conn, SqliteDialect())
