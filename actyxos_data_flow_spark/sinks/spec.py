"""Output-table specifications (the reference's DbRecord surface).

Mirrors the semantics of /root/reference/src/db/mod.rs:134-206: a flat
record with a fixed column list, raw SQL type strings, an ``exclude``
flag for DB-generated columns, one optional non-unique composite index,
and an integer schema version whose bump triggers drop-and-rebuild
(/root/reference/src/db/mod.rs:43-53,295-315).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DbColumn:
    name: str
    tpe: str  # raw SQL type, e.g. "text not null", "bigint"
    exclude: bool = False  # DB-populated (e.g. autoincrement): not written
    index: bool = False  # member of the table's composite index


@dataclass(frozen=True)
class DbTable:
    """One materialized output table + its offsets companion."""

    name: str
    columns: tuple[DbColumn, ...]
    version: int = 1

    @property
    def written_columns(self) -> tuple[DbColumn, ...]:
        return tuple(c for c in self.columns if not c.exclude)

    @property
    def offsets_table(self) -> str:
        return f"{self.name}_offsets"

    def create_sql(self) -> list[str]:
        cols = ", ".join(f"{c.name} {c.tpe}" for c in self.columns)
        stmts = [f"CREATE TABLE IF NOT EXISTS {self.name} ({cols})"]
        idx_cols = [c.name for c in self.columns if c.index]
        if idx_cols:
            stmts.append(
                f"CREATE INDEX IF NOT EXISTS idx_{self.name} ON {self.name} ({', '.join(idx_cols)})"
            )
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {self.offsets_table} "
            f"(source TEXT PRIMARY KEY, offset_ BIGINT NOT NULL)"
        )
        return stmts

    def drop_sql(self) -> list[str]:
        return [
            f"DROP TABLE IF EXISTS {self.name}",
            f"DROP TABLE IF EXISTS {self.offsets_table}",
        ]


@dataclass(frozen=True)
class Union:
    """Multiple record types computed from one input stream, sharing one
    offsets table and one transaction (/root/reference/src/db/mod.rs:230-244).
    The first table's offsets companion is the shared one."""

    tables: tuple[DbTable, ...] = field(default_factory=tuple)

    @property
    def offsets_table(self) -> str:
        return self.tables[0].offsets_table

    @property
    def version(self) -> int:
        return sum(t.version for t in self.tables)
