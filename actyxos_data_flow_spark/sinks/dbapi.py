"""Store-agnostic exactly-once sink over any DB-API 2.0 connection.

The delivery contract is the reference's ``DB`` trait
(/root/reference/src/db/mod.rs:208-263): per batch, ONE transaction
applies every delta row and upserts the per-source offsets; +n inserts
n copies, −n deletes exactly n matching copies (never more). Schema
versioning (K7): a ``_schema_versions`` table records each table's
version; a mismatch drops and recreates the data + offsets tables so
the runner refills them from replay
(/root/reference/src/db/mod.rs:295-315). All dialect-specific SQL comes
from :mod:`.dialect` — this file is the algorithm, shared verbatim by
SQLite, PostgreSQL and MSSQL exactly as the reference shares its
``advance_offsets`` across drivers.

Single-writer assumption: one runner owns the sink tables (the
reference's topology — one in-process channel drains into one
connection, /root/reference/src/runner.rs:113-122). Upserts are
select-then-insert/update inside the write transaction, which is safe
under that assumption (and under MSSQL's SERIALIZABLE begin) without
relying on per-dialect ON CONFLICT syntax or DB-API ``rowcount``
support.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence
from contextlib import contextmanager

from .dialect import Dialect
from .spec import DbTable, Union

VERSIONS_TABLE = "_schema_versions"
MIRROR_TABLE = "_mirror_state"


class DbapiSink:
    def __init__(self, conn, dialect: Dialect):
        self.conn = conn
        self.dialect = dialect
        d = dialect
        with self._txn() as cur:
            cur.execute(
                d.create_table(
                    VERSIONS_TABLE,
                    f"table_name {d.meta_text} PRIMARY KEY, version BIGINT NOT NULL",
                )
            )
            # Which parquet-mirror epoch each table's stored rows
            # correspond to (sinks/writer.py keeps the previous snapshot
            # distributed; the pointer commits in the same transaction
            # as the delta so mirror and table can never diverge).
            cur.execute(
                d.create_table(
                    MIRROR_TABLE,
                    f"table_name {d.meta_text} PRIMARY KEY, epoch {d.meta_text} NOT NULL",
                )
            )

    @contextmanager
    def _txn(self):
        cur = self.conn.cursor()
        for stmt in self.dialect.begin_stmts():
            cur.execute(stmt)
        try:
            yield cur
            self.conn.commit()
        except BaseException:
            self.conn.rollback()
            raise

    def _upsert(self, cur, table: str, key_col: str, key, val_col: str, val) -> None:
        d = self.dialect
        cur.execute(f"SELECT 1 FROM {table} WHERE {key_col} = {d.ph(1)}", (key,))
        if cur.fetchone():
            cur.execute(
                f"UPDATE {table} SET {val_col} = {d.ph(1)} WHERE {key_col} = {d.ph(2)}",
                (val, key),
            )
        else:
            cur.execute(
                f"INSERT INTO {table} ({key_col}, {val_col}) "
                f"VALUES ({d.ph(1)}, {d.ph(2)})",
                (key, val),
            )

    # -- bootstrap / migration (K7) ------------------------------------

    def ensure(self, spec: DbTable | Union) -> bool:
        """Create tables; on version mismatch drop + recreate (returns
        True if a rebuild happened → caller must replay from scratch)."""
        d = self.dialect
        tables = spec.tables if isinstance(spec, Union) else (spec,)
        key = "+".join(t.name for t in tables)
        version = spec.version
        with self._txn() as cur:
            cur.execute(
                f"SELECT version FROM {VERSIONS_TABLE} WHERE table_name = {d.ph(1)}",
                (key,),
            )
            cur_row = cur.fetchone()
            rebuilt = False
            if cur_row is not None and cur_row[0] != version:
                for t in tables:
                    cur.execute(d.drop_table(t.name))
                    cur.execute(d.drop_table(t.offsets_table))
                    cur.execute(
                        f"DELETE FROM {MIRROR_TABLE} WHERE table_name = {d.ph(1)}",
                        (t.name,),
                    )
                rebuilt = True
            for t in tables:
                cols_def = ", ".join(f"{c.name} {c.tpe}" for c in t.columns)
                cur.execute(d.create_table(t.name, cols_def))
                idx_cols = [c.name for c in t.columns if c.index]
                if idx_cols:
                    cur.execute(
                        d.create_index(f"idx_{t.name}", t.name, ", ".join(idx_cols))
                    )
                cur.execute(
                    d.create_table(
                        t.offsets_table,
                        f"source {d.meta_text} PRIMARY KEY, offset_ BIGINT NOT NULL",
                    )
                )
            self._upsert(cur, VERSIONS_TABLE, "table_name", key, "version", version)
        return rebuilt

    # -- offsets (K6) ---------------------------------------------------

    def read_offsets(self, spec: DbTable | Union) -> dict[str, int]:
        """The OffsetMap the stored rows reflect — the resume point
        (/root/reference/src/db/sqlite.rs:189-208)."""
        cur = self.conn.cursor()
        cur.execute(f"SELECT source, offset_ FROM {spec.offsets_table}")
        return dict(cur.fetchall())

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
        exactly n copies (limited delete, NULL-safe compare).
        ``mirror_epochs`` (table_name → epoch) commits the snapshot-mirror
        pointer atomically with the data it mirrors."""
        d = self.dialect
        if offsets_table is None:
            offsets_table = next(iter(deltas)).offsets_table if deltas else None
        with self._txn() as cur:
            for table, batch in deltas.items():
                cols = [c.name for c in table.written_columns]
                insert = d.insert_sql(table.name, cols)
                delete, delete_params = d.delete_exact(table.name, cols)
                for row, mult in batch:
                    row = tuple(row)
                    if mult > 0:
                        cur.executemany(insert, [row] * mult)
                    elif mult < 0:
                        cur.execute(delete, delete_params(row, -mult))
            if offsets_table is not None:
                for source, off in offsets.items():
                    self._upsert(cur, offsets_table, "source", source, "offset_", off)
            for table_name, epoch in (mirror_epochs or {}).items():
                self._upsert(
                    cur, MIRROR_TABLE, "table_name", table_name, "epoch", epoch
                )

    def mirror_epoch(self, table_name: str) -> str | None:
        """Snapshot-mirror epoch the stored rows of ``table_name`` match."""
        d = self.dialect
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT epoch FROM {MIRROR_TABLE} WHERE table_name = {d.ph(1)}",
            (table_name,),
        )
        row = cur.fetchone()
        return row[0] if row else None

    # -- introspection helpers ------------------------------------------

    def rows(self, table: DbTable) -> list[tuple]:
        cols = ", ".join(c.name for c in table.written_columns)
        cur = self.conn.cursor()
        cur.execute(f"SELECT {cols} FROM {table.name} ORDER BY {cols}")
        return [tuple(r) for r in cur.fetchall()]

    def close(self) -> None:
        self.conn.close()
