"""SQL dialects for the exactly-once sink core (K3/K4/K5).

The reference ships ONE delivery algorithm against three stores —
SQLite (/root/reference/src/db/sqlite.rs), PostgreSQL
(/root/reference/src/db/postgre.rs), MSSQL
(/root/reference/src/db/mssql.rs) — behind a ``DbMechanics`` trait
providing only the dialect-specific SQL shapes: placeholder style,
create-if-not-exists idiom, multiplicity-limited delete, NULL-safe
compare (/root/reference/src/db/mod.rs:86-132). This module is that
trait for :class:`~actyxos_data_flow_spark.sinks.dbapi.DbapiSink`.

Divergence worth noting: the reference's Postgres driver cannot limit a
DELETE, so it deletes ALL matching rows and re-inserts the surplus
(/root/reference/src/db/postgre.rs:243-252). We delete exactly n via a
ctid-subquery ``LIMIT`` — one statement, no re-insert churn, same
net effect.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


class Dialect:
    """SQLite shapes; the base class because SQLite is the reference's
    canonical sink (/root/reference/src/db/sqlite.rs)."""

    name = "sqlite"
    #: hidden row-address column enabling "delete exactly n" via an
    #: IN-subquery with LIMIT; None = dialect has a direct limited DELETE
    rowid = "rowid"
    #: type used for meta-table key columns (MSSQL cannot key on TEXT)
    meta_text = "TEXT"

    def ph(self, i: int) -> str:
        """Positional placeholder #i (1-based)."""
        return "?"

    def begin_stmts(self) -> list[str]:
        """Statements to run at the start of every write transaction."""
        return []

    def recursive_kw(self) -> str:
        """Keyword introducing a recursive CTE (empty on MSSQL, where
        WITH is implicitly recursive)."""
        return "RECURSIVE"

    def recursion_opts(self) -> str:
        """Statement suffix lifting the recursion depth cap (MSSQL
        defaults to MAXRECURSION 100, which a multiplicity > 101 would
        trip; other dialects have no cap to lift)."""
        return ""

    # -- DDL ------------------------------------------------------------

    def create_table(self, name: str, cols_def: str) -> str:
        return f"CREATE TABLE IF NOT EXISTS {name} ({cols_def})"

    def create_index(self, name: str, table: str, cols: str) -> str:
        return f"CREATE INDEX IF NOT EXISTS {name} ON {table} ({cols})"

    def drop_table(self, name: str) -> str:
        return f"DROP TABLE IF EXISTS {name}"

    # -- NULL-safe row matching ----------------------------------------

    def eq_nullsafe(self, col: str, i: int) -> tuple[str, int]:
        """(fragment, #placeholders) for NULL-safe ``col = ?``."""
        return f"{col} IS {self.ph(i)}", 1

    def where_nullsafe(self, cols: Sequence[str], start: int = 1) -> tuple[str, int]:
        """(WHERE clause, next free placeholder index)."""
        parts, i = [], start
        for c in cols:
            frag, used = self.eq_nullsafe(c, i)
            parts.append(frag)
            i += used
        return " AND ".join(parts), i

    def expand_row(self, row: Sequence) -> tuple:
        """Row values in placeholder order for :meth:`where_nullsafe`."""
        return tuple(row)

    # -- DML ------------------------------------------------------------

    def insert_sql(self, table: str, cols: Sequence[str]) -> str:
        phs = ", ".join(self.ph(i + 1) for i in range(len(cols)))
        return f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({phs})"

    def delete_exact(
        self, table: str, cols: Sequence[str]
    ) -> tuple[str, Callable[[Sequence, int], tuple]]:
        """(sql, params(row, n)) deleting EXACTLY n rows matching ``row``
        (−n multiplicity must never remove more copies than retracted —
        /root/reference/src/db/sqlite.rs:246-259)."""
        where, nxt = self.where_nullsafe(cols, 1)
        sql = (
            f"DELETE FROM {table} WHERE {self.rowid} IN "
            f"(SELECT {self.rowid} FROM {table} WHERE {where} LIMIT {self.ph(nxt)})"
        )
        return sql, lambda row, n: (*self.expand_row(row), n)


class SqliteDialect(Dialect):
    pass


class PostgresDialect(Dialect):
    """psycopg/psycopg2 shapes: pyformat placeholders, ``IS NOT DISTINCT
    FROM``, ctid-limited delete (/root/reference/src/db/postgre.rs:139-171)."""

    name = "postgres"
    rowid = "ctid"

    def ph(self, i: int) -> str:
        return "%s"

    def eq_nullsafe(self, col: str, i: int) -> tuple[str, int]:
        return f"{col} IS NOT DISTINCT FROM {self.ph(i)}", 1


class MssqlDialect(Dialect):
    """SQL Server shapes (/root/reference/src/db/mssql.rs:196-227):
    sys.tables/sys.indexes existence guards, ``DELETE TOP (n)``,
    CASE-based NULL-safe compare (each value bound twice), SERIALIZABLE
    writes. Default placeholders are qmark (pyodbc); pass ``ph_text='%s'``
    for pymssql."""

    name = "mssql"
    rowid = None
    meta_text = "VARCHAR(255)"

    def __init__(self, ph_text: str = "?"):
        self._ph = ph_text

    def ph(self, i: int) -> str:
        return self._ph

    def recursive_kw(self) -> str:
        return ""

    def recursion_opts(self) -> str:
        return " OPTION (MAXRECURSION 0)"

    def begin_stmts(self) -> list[str]:
        # /root/reference/src/db/mssql.rs:266-270 runs every write batch
        # under SERIALIZABLE
        return ["SET TRANSACTION ISOLATION LEVEL SERIALIZABLE"]

    def create_table(self, name: str, cols_def: str) -> str:
        return (
            f"IF NOT EXISTS (SELECT * FROM sys.tables WHERE name = '{name}') "
            f"CREATE TABLE {name} ({cols_def})"
        )

    def create_index(self, name: str, table: str, cols: str) -> str:
        return (
            f"IF NOT EXISTS (SELECT * FROM sys.indexes WHERE name = '{name}') "
            f"CREATE INDEX {name} ON {table} ({cols})"
        )

    def eq_nullsafe(self, col: str, i: int) -> tuple[str, int]:
        p1, p2 = self.ph(i), self.ph(i + 1)
        return (
            f"({col} = {p1} OR (CASE WHEN {col} IS NULL AND {p2} IS NULL "
            "THEN 1 ELSE 0 END) = 1)",
            2,
        )

    def expand_row(self, row: Sequence) -> tuple:
        return tuple(v for v in row for _ in (0, 1))

    def delete_exact(
        self, table: str, cols: Sequence[str]
    ) -> tuple[str, Callable[[Sequence, int], tuple]]:
        # TOP's count is the FIRST parameter (@P1 —
        # /root/reference/src/db/mssql.rs:216-218, :288)
        where, _ = self.where_nullsafe(cols, 2)
        sql = f"DELETE TOP ({self.ph(1)}) FROM {table} WHERE {where}"
        return sql, lambda row, n: (n, *self.expand_row(row))
