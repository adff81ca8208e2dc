"""Transactional SQLite sink with offsets-in-transaction exactly-once.

Replicates the delivery contract of the reference's SQLite driver
(/root/reference/src/db/sqlite.rs:37-124 init/migration, :211-269
write): per batch, ONE transaction applies every delta row and upserts
the per-source offsets; multiplicity +n inserts n copies, −n deletes
exactly n matching copies (never more). WAL journal mode for concurrent
readers. Schema versioning: a ``_schema_versions`` table records each
table's version; a mismatch drops and recreates the data + offsets
tables so the runner refills them from replay
(/root/reference/src/db/mod.rs:295-315).

SQLite is single-writer, so the apply runs wherever the connection
lives (the Spark driver in our runner). The algorithm — offsets and
data in one transaction keyed by source — is connection-agnostic and is
what a JDBC ``foreachPartition`` writer would run per partition against
a multi-writer store.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterable, Mapping, Sequence

from .spec import DbTable, Union

VERSIONS_TABLE = "_schema_versions"
MIRROR_TABLE = "_mirror_state"


class SqliteSink:
    def __init__(self, path: str = ":memory:"):
        # check_same_thread off: foreachBatch handlers run on a worker
        # thread; batches are serialized so single-writer safety holds.
        self.conn = sqlite3.connect(path, check_same_thread=False)
        self.conn.execute("PRAGMA journal_mode=WAL")
        self.conn.execute("PRAGMA synchronous=NORMAL")
        self.conn.execute(
            f"CREATE TABLE IF NOT EXISTS {VERSIONS_TABLE} "
            "(table_name TEXT PRIMARY KEY, version BIGINT NOT NULL)"
        )
        # Which parquet-mirror epoch each table's stored rows correspond
        # to (sinks/writer.py keeps the previous snapshot distributed;
        # the pointer commits in the same transaction as the delta so
        # mirror and table can never diverge).
        self.conn.execute(
            f"CREATE TABLE IF NOT EXISTS {MIRROR_TABLE} "
            "(table_name TEXT PRIMARY KEY, epoch TEXT NOT NULL)"
        )
        self.conn.commit()

    # -- bootstrap / migration (K7) ------------------------------------

    def ensure(self, spec: DbTable | Union) -> bool:
        """Create tables; on version mismatch drop + recreate (returns
        True if a rebuild happened → caller must replay from scratch)."""
        tables = spec.tables if isinstance(spec, Union) else (spec,)
        key = "+".join(t.name for t in tables)
        version = spec.version
        cur = self.conn.execute(
            f"SELECT version FROM {VERSIONS_TABLE} WHERE table_name = ?", (key,)
        ).fetchone()
        rebuilt = False
        if cur is not None and cur[0] != version:
            for t in tables:
                for stmt in t.drop_sql():
                    self.conn.execute(stmt)
                self.conn.execute(
                    f"DELETE FROM {MIRROR_TABLE} WHERE table_name = ?", (t.name,)
                )
            rebuilt = True
        for t in tables:
            for stmt in t.create_sql():
                self.conn.execute(stmt)
        self.conn.execute(
            f"INSERT INTO {VERSIONS_TABLE} (table_name, version) VALUES (?, ?) "
            "ON CONFLICT(table_name) DO UPDATE SET version = excluded.version",
            (key, version),
        )
        self.conn.commit()
        return rebuilt

    # -- offsets (K6) ---------------------------------------------------

    def read_offsets(self, spec: DbTable | Union) -> dict[str, int]:
        """The OffsetMap the stored rows reflect — the resume point
        (/root/reference/src/db/sqlite.rs:189-208)."""
        rows = self.conn.execute(
            f"SELECT source, offset_ FROM {spec.offsets_table}"
        ).fetchall()
        return dict(rows)

    # -- the exactly-once write (K3) ------------------------------------

    def advance_offsets(
        self,
        deltas: Mapping[DbTable, Iterable[tuple[Sequence, int]]],
        offsets: Mapping[str, int],
        offsets_table: str | None = None,
        mirror_epochs: Mapping[str, str] | None = None,
    ) -> None:
        """Apply one consolidated delta batch + the offsets it reflects
        in ONE transaction. ``deltas``: per table, (row_values, mult)
        pairs over written_columns; +n inserts n copies, −n deletes
        exactly n copies (rowid-limited, NULL-safe compare).
        ``mirror_epochs`` (table_name → epoch) commits the snapshot-mirror
        pointer atomically with the data it mirrors."""
        if offsets_table is None:
            offsets_table = next(iter(deltas)).offsets_table if deltas else None
        with self.conn:  # one transaction
            for table, batch in deltas.items():
                cols = [c.name for c in table.written_columns]
                collist = ", ".join(cols)
                placeholders = ", ".join("?" for _ in cols)
                insert = f"INSERT INTO {table.name} ({collist}) VALUES ({placeholders})"
                # NULL-safe: SQLite `IS` matches NULLs like the reference's
                # CASE-based compare (/root/reference/src/db/postgre.rs:160-171)
                where = " AND ".join(f"{c} IS ?" for c in cols)
                delete = (
                    f"DELETE FROM {table.name} WHERE rowid IN "
                    f"(SELECT rowid FROM {table.name} WHERE {where} LIMIT ?)"
                )
                for row, mult in batch:
                    row = tuple(row)
                    if mult > 0:
                        self.conn.executemany(insert, [row] * mult)
                    elif mult < 0:
                        self.conn.execute(delete, row + (-mult,))
            if offsets_table is not None:
                for source, off in offsets.items():
                    self.conn.execute(
                        f"INSERT INTO {offsets_table} (source, offset_) VALUES (?, ?) "
                        "ON CONFLICT(source) DO UPDATE SET offset_ = excluded.offset_",
                        (source, off),
                    )
            for table_name, epoch in (mirror_epochs or {}).items():
                self.conn.execute(
                    f"INSERT INTO {MIRROR_TABLE} (table_name, epoch) VALUES (?, ?) "
                    "ON CONFLICT(table_name) DO UPDATE SET epoch = excluded.epoch",
                    (table_name, epoch),
                )

    def mirror_epoch(self, table_name: str) -> str | None:
        """Snapshot-mirror epoch the stored rows of ``table_name`` match."""
        row = self.conn.execute(
            f"SELECT epoch FROM {MIRROR_TABLE} WHERE table_name = ?", (table_name,)
        ).fetchone()
        return row[0] if row else None

    # -- introspection helpers ------------------------------------------

    def rows(self, table: DbTable) -> list[tuple]:
        cols = ", ".join(c.name for c in table.written_columns)
        order = ", ".join(c.name for c in table.written_columns)
        return self.conn.execute(
            f"SELECT {cols} FROM {table.name} ORDER BY {order}"
        ).fetchall()

    def close(self) -> None:
        self.conn.close()
