"""MSSQL sink (K5): the DB-API core + SQL Server dialect.

Mirrors the reference's MSSQL driver
(/root/reference/src/db/mssql.rs:196-227 mechanics, :266-358 write):
``DELETE TOP (n)`` multiplicity-limited delete with the count as the
first parameter, CASE-based NULL-safe compare (each value bound twice),
sys.tables/sys.indexes existence-guarded DDL, and SERIALIZABLE write
transactions.

Import-gated on pyodbc (qmark placeholders) with a pymssql fallback
(pyformat); this container ships neither, so construction raises
ImportError — the dialect + algorithm are fully unit-tested without a
server, and the env-gated round-trip test uses ``MSSQL_CONNECT``
(mirroring the reference's connection-string-driven test harness).
"""

from __future__ import annotations

from .dbapi import DbapiSink
from .dialect import MssqlDialect


def connect_mssql(conninfo: str):
    """(connection, dialect) from whichever SQL Server driver is
    available (pyodbc, else pymssql — they differ in placeholder
    style)."""
    try:
        import pyodbc  # type: ignore[import-not-found]

        conn = pyodbc.connect(conninfo, autocommit=False)
        return conn, MssqlDialect(ph_text="?")
    except ImportError:
        pass
    try:
        import pymssql  # type: ignore[import-not-found]

        return pymssql.connect(conninfo), MssqlDialect(ph_text="%s")
    except ImportError as e:
        raise ImportError(
            "MssqlSink needs pyodbc or pymssql; neither is installed"
        ) from e


class MssqlSink(DbapiSink):
    def __init__(self, conninfo: str):
        conn, dialect = connect_mssql(conninfo)
        super().__init__(conn, dialect)
