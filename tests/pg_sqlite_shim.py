"""Postgres-to-SQLite translator shim (test utility).

Runs the VERBATIM :class:`PostgresDialect` SQL — pyformat ``%s``
placeholders, ``IS NOT DISTINCT FROM``, ``ctid``-subquery limited
deletes — against a real SQLite engine by translating at the
connection/cursor layer. Unlike a dialect subclass that overrides
``ph()``/``rowid`` (the DuckDB harness), nothing in the dialect is
replaced: every statement DbapiSink/DistributedApplier would send to a
Postgres server is generated, then mechanically mapped to the SQLite
equivalents (``IS`` is SQLite's null-safe compare; ``rowid`` is its row
address; qmark its placeholder). Module-level so Spark executors can
unpickle the factory for distributed staging tests.

The env-gated real-server round-trip remains
``POSTGRES_CONNECT=... pytest tests/test_sink_dialects.py -k env_gated``
(mirroring /root/reference/src/db/postgre.rs:301-342).
"""

from __future__ import annotations

import sqlite3


def translate_pg_sql(sql: str) -> str:
    sql = sql.replace(" IS NOT DISTINCT FROM ", " IS ")
    sql = sql.replace("ctid", "rowid")
    return sql.replace("%s", "?")


class PgShimCursor:
    def __init__(self, cur: sqlite3.Cursor):
        self._cur = cur

    def execute(self, sql: str, params=()):
        return self._cur.execute(translate_pg_sql(sql), params)

    def executemany(self, sql: str, seq):
        return self._cur.executemany(translate_pg_sql(sql), seq)

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()

    @property
    def rowcount(self):
        return self._cur.rowcount

    @property
    def description(self):
        return self._cur.description

    def close(self):
        self._cur.close()


class PgShimConnection:
    def __init__(self, path: str):
        self._conn = sqlite3.connect(path, timeout=30.0)
        self._conn.execute("PRAGMA busy_timeout=30000")

    def cursor(self) -> PgShimCursor:
        return PgShimCursor(self._conn.cursor())

    def commit(self):
        self._conn.commit()

    def rollback(self):
        self._conn.rollback()

    def close(self):
        self._conn.close()

    def execute(self, sql: str, params=()):  # convenience for assertions
        return self._conn.execute(translate_pg_sql(sql), params)


def pg_shim_factory(path: str):
    """Picklable connection factory for DistributedApplier executors."""

    def connect():
        return PgShimConnection(path)

    return connect
