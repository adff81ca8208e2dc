"""MSSQL-to-SQLite translator shim (test utility).

Runs the VERBATIM :class:`MssqlDialect` SQL — ``DELETE TOP (?)`` with
the count as the FIRST parameter, ``IF NOT EXISTS (SELECT * FROM
sys.tables/indexes ...)`` DDL guards, CASE-based NULL-safe compares,
``SET TRANSACTION ISOLATION LEVEL SERIALIZABLE`` and ``OPTION
(MAXRECURSION 0)`` — against a real SQLite engine by translating at the
connection/cursor layer, the sibling of :mod:`tests.pg_sqlite_shim`.
Nothing in the dialect is replaced: every statement DbapiSink /
DistributedApplier would send to a SQL Server is generated first, then
mechanically mapped:

- SERIALIZABLE set → no-op (SQLite transactions are serializable);
- sys.tables/sys.indexes existence guards → ``IF NOT EXISTS`` DDL;
- ``DELETE TOP (?) ... WHERE w`` → rowid-subquery ``LIMIT ?`` with the
  count parameter ROTATED from first to last;
- ``OPTION (MAXRECURSION 0)`` suffix → stripped (SQLite has no cap, and
  accepts recursive CTEs without the RECURSIVE keyword, matching
  T-SQL's implicit-recursion WITH);
- the CASE NULL-safe compare and VARCHAR(255) key columns are valid
  SQLite as-is.

Module-level so Spark executors can unpickle the factory for the
distributed staging test. The env-gated real-server round-trip remains
``MSSQL_CONNECT=... pytest tests/test_sink_dialects.py -k env_gated``
(mirroring /root/reference/src/db/mssql.rs:396-438).
"""

from __future__ import annotations

import re
import sqlite3

_CREATE_TABLE_GUARD = re.compile(
    r"^IF NOT EXISTS \(SELECT \* FROM sys\.tables WHERE name = '[^']+'\) "
    r"CREATE TABLE (\S+) (\(.*\))$",
    re.S,
)
_CREATE_INDEX_GUARD = re.compile(
    r"^IF NOT EXISTS \(SELECT \* FROM sys\.indexes WHERE name = '[^']+'\) "
    r"CREATE INDEX (\S+) ON (\S+) (\(.*\))$",
    re.S,
)
_DELETE_TOP = re.compile(r"^DELETE TOP \(\?\) FROM (\S+) WHERE (.*)$", re.S)


def translate_mssql_sql(sql: str) -> tuple[str | None, bool]:
    """(translated sql | None for no-op statements, rotate_params)."""
    sql = sql.replace(" OPTION (MAXRECURSION 0)", "")
    if sql.startswith("SET TRANSACTION ISOLATION LEVEL"):
        return None, False
    m = _CREATE_TABLE_GUARD.match(sql)
    if m:
        return f"CREATE TABLE IF NOT EXISTS {m.group(1)} {m.group(2)}", False
    m = _CREATE_INDEX_GUARD.match(sql)
    if m:
        return (
            f"CREATE INDEX IF NOT EXISTS {m.group(1)} ON {m.group(2)} {m.group(3)}",
            False,
        )
    m = _DELETE_TOP.match(sql)
    if m:
        table, where = m.group(1), m.group(2)
        # T-SQL binds the TOP count FIRST; LIMIT binds it LAST → rotate
        return (
            f"DELETE FROM {table} WHERE rowid IN "
            f"(SELECT rowid FROM {table} WHERE {where} LIMIT ?)",
            True,
        )
    return sql, False


_xlate = translate_mssql_sql


class MssqlShimCursor:
    def __init__(self, cur: sqlite3.Cursor):
        self._cur = cur

    def execute(self, sql: str, params=()):
        out, rotate = _xlate(sql)
        if out is None:
            return self._cur
        if rotate:
            params = tuple(params[1:]) + tuple(params[:1])
        return self._cur.execute(out, params)

    def executemany(self, sql: str, seq):
        out, rotate = _xlate(sql)
        if out is None:
            return self._cur
        if rotate:
            seq = [tuple(p[1:]) + tuple(p[:1]) for p in seq]
        return self._cur.executemany(out, seq)

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


class MssqlShimConnection:
    def __init__(self, path: str):
        self._conn = sqlite3.connect(path, timeout=30.0)
        self._conn.execute("PRAGMA busy_timeout=30000")

    def cursor(self) -> MssqlShimCursor:
        return MssqlShimCursor(self._conn.cursor())

    def commit(self):
        self._conn.commit()

    def rollback(self):
        self._conn.rollback()

    def close(self):
        self._conn.close()

    def execute(self, sql: str, params=()):  # convenience for assertions
        out, rotate = _xlate(sql)
        if out is None:
            return None
        if rotate:
            params = tuple(params[1:]) + tuple(params[:1])
        return self._conn.execute(out, params)


def mssql_shim_factory(path: str):
    """Picklable connection factory for DistributedApplier executors."""

    def connect():
        return MssqlShimConnection(path)

    return connect
