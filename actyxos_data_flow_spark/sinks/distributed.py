"""Distributed two-phase delta apply: executors bulk-load, one
transaction finalizes.

The driver-side apply (writer.py) collects the churn-sized net delta —
the reference's own topology (one in-process channel into one
connection, /root/reference/src/runner.rs:113-122) and the right call
when churn is small. It breaks down when an epoch's delta is huge
(initial backfill, schema-version rebuild replay: delta == the whole
view). This module is that scale path:

Phase 1 — ``stage``: ``foreachPartition`` writes the delta DataFrame
straight from the executors into a staging table (per-partition DB
connections, executemany batches). Every partition first deletes its
own (epoch, partition) slice, so Spark task retries are idempotent.
The bulk rows never transit the driver.

Phase 2 — ``finalize``: ONE transaction on one connection applies the
staged epoch to the target table set-wise — positive multiplicities via
a recursive-CTE expanding INSERT ... SELECT (DB-local, no row leaves
the database), negative multiplicities (retraction churn — small by
nature) through the standard NULL-safe delete-exactly-n loop — then
upserts offsets + mirror pointer and clears the stage, preserving the
offsets-in-transaction exactly-once contract
(/root/reference/src/db/mod.rs:361-394).

End-to-end exactly-once relies on the snapshot-diff loop it plugs into
(sinks/writer.py): a retried epoch recomputes its delta against the
already-committed mirror and stages nothing. ``finalize`` alone is
idempotent only per committed epoch (the stage slice is deleted in the
same transaction).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..delta import DELTA_COL
from .dbapi import MIRROR_TABLE, DbapiSink
from .dialect import Dialect
from .spec import DbTable

ConnFactory = Callable[[], object]  # DB-API connection; must be picklable


def _stage_name(table: DbTable) -> str:
    return f"{table.name}_stage"


class DistributedApplier:
    """Two-phase apply against any dialect the DB-API core supports.
    ``factory`` runs on executors (phase 1) and the driver (phase 2) —
    e.g. ``lambda: sqlite3.connect(path)`` or a psycopg connector."""

    def __init__(self, factory: ConnFactory, dialect: Dialect):
        self.factory = factory
        self.dialect = dialect

    def ensure_stage(self, sink: DbapiSink, table: DbTable) -> None:
        d = self.dialect
        cols_def = ", ".join(f"{c.name} {c.tpe}" for c in table.written_columns)
        with sink._txn() as cur:
            cur.execute(
                d.create_table(
                    _stage_name(table),
                    f"{cols_def}, _delta BIGINT NOT NULL, _epoch {d.meta_text} NOT NULL, _part INT NOT NULL",
                )
            )
            cur.execute(
                d.create_index(
                    f"idx_{_stage_name(table)}", _stage_name(table), "_epoch, _part"
                )
            )

    # -- phase 1: executor-parallel bulk load ---------------------------

    def stage(self, delta_df: DataFrame, table: DbTable, epoch: str, batch_size: int = 1000) -> None:
        """Bulk-insert ``delta_df`` (written_columns + delta) into the
        staging table from the executors. Delete-then-insert per
        (epoch, partition) slice ⇒ task retries converge; a driver-side
        whole-epoch clear first ⇒ EPOCH retries converge too (a
        recomputed delta may land in fewer/different partitions than a
        crashed prior attempt — per-partition deletes alone would leave
        the prior attempt's orphan slices for finalize to apply)."""
        cols = [c.name for c in table.written_columns]
        factory, dialect = self.factory, self.dialect
        stage = _stage_name(table)

        conn = factory()
        try:
            cur = conn.cursor()
            cur.execute(f"DELETE FROM {stage} WHERE _epoch = {dialect.ph(1)}", (epoch,))
            conn.commit()
        finally:
            conn.close()
        n_cols = len(cols) + 3
        insert = (
            f"INSERT INTO {stage} ({', '.join(cols)}, _delta, _epoch, _part) "
            f"VALUES ({', '.join(dialect.ph(i + 1) for i in range(n_cols))})"
        )
        clear = (
            f"DELETE FROM {stage} WHERE _epoch = {dialect.ph(1)} AND _part = {dialect.ph(2)}"
        )
        parted = delta_df.select(
            *cols, F.col(DELTA_COL), F.spark_partition_id().alias("_part")
        )

        def write_partition(rows) -> None:
            rows = iter(rows)
            try:
                first = next(rows)
            except StopIteration:
                return
            conn = factory()
            try:
                cur = conn.cursor()
                pid = first["_part"]
                cur.execute(clear, (epoch, pid))
                batch = [tuple(first[c] for c in cols) + (first[DELTA_COL], epoch, pid)]
                for r in rows:
                    batch.append(tuple(r[c] for c in cols) + (r[DELTA_COL], epoch, pid))
                    if len(batch) >= batch_size:
                        cur.executemany(insert, batch)
                        batch = []
                if batch:
                    cur.executemany(insert, batch)
                conn.commit()
            except BaseException:
                conn.rollback()
                raise
            finally:
                conn.close()

        parted.foreachPartition(write_partition)

    # -- phase 2: one finalize transaction ------------------------------

    def _apply_staged(self, sink: DbapiSink, cur, table: DbTable, epoch: str) -> tuple[int, int]:
        d = self.dialect
        cols = [c.name for c in table.written_columns]
        collist = ", ".join(cols)
        stage = _stage_name(table)
        # positives: set-wise multiplicity expansion inside the DB. The
        # WITH clause leads the statement — the one CTE+INSERT order all
        # three dialects accept (T-SQL rejects INSERT ... WITH; SQLite
        # and Postgres accept both) — and recursion_opts() lifts MSSQL's
        # default MAXRECURSION 100 cap.
        cur.execute(
            f"WITH {d.recursive_kw()} _x ({collist}, _d) AS ("
            f"  SELECT {collist}, _delta FROM {stage} "
            f"  WHERE _epoch = {d.ph(1)} AND _delta > 0"
            f"  UNION ALL SELECT {collist}, _d - 1 FROM _x WHERE _d > 1"
            f") INSERT INTO {table.name} ({collist}) "
            f"SELECT {collist} FROM _x{d.recursion_opts()}",
            (epoch,),
        )
        # rowcount is unreliable for a WITH-led INSERT (python sqlite3
        # flags DML by the statement's first keyword and reports -1);
        # the staged positive multiplicity sum is the exact insert count
        cur.execute(
            f"SELECT COALESCE(SUM(_delta), 0) FROM {stage} "
            f"WHERE _epoch = {d.ph(1)} AND _delta > 0",
            (epoch,),
        )
        inserted = int(cur.fetchone()[0])
        # negatives: churn-sized; standard exact-n loop
        cur.execute(
            f"SELECT {collist}, _delta FROM {stage} "
            f"WHERE _epoch = {d.ph(1)} AND _delta < 0",
            (epoch,),
        )
        negatives = cur.fetchall()
        delete, delete_params = d.delete_exact(table.name, cols)
        for row in negatives:
            cur.execute(delete, delete_params(tuple(row[:-1]), -row[-1]))
        cur.execute(f"DELETE FROM {stage} WHERE _epoch = {d.ph(1)}", (epoch,))
        return inserted, len(negatives)

    def finalize(
        self,
        sink: DbapiSink,
        table: DbTable,
        epoch: str,
        offsets: Mapping[str, int],
        offsets_table: str | None = None,
        mirror_epochs: Mapping[str, str] | None = None,
    ) -> tuple[int, int]:
        """Apply the staged epoch in ONE transaction; returns
        (inserted_rows, retraction_rows). Inserts expand DB-locally via
        recursive CTE; retractions run through delete-exactly-n."""
        res = self.finalize_many(
            sink,
            [table],
            epoch,
            offsets,
            offsets_table=offsets_table or table.offsets_table,
            mirror_epochs=mirror_epochs,
        )
        return res[table.name]

    def finalize_many(
        self,
        sink: DbapiSink,
        tables: list[DbTable],
        epoch: str,
        offsets: Mapping[str, int],
        offsets_table: str | None = None,
        mirror_epochs: Mapping[str, str] | None = None,
    ) -> dict[str, tuple[int, int]]:
        """Multi-table finalize: apply every table's staged epoch + the
        shared offsets + mirror pointers in ONE transaction (the Union
        contract, /root/reference/src/db/mod.rs:230-244)."""
        if offsets_table is None:
            offsets_table = tables[0].offsets_table
        results: dict[str, tuple[int, int]] = {}
        with sink._txn() as cur:
            for table in tables:
                results[table.name] = self._apply_staged(sink, cur, table, epoch)
            for source, off in offsets.items():
                sink._upsert(cur, offsets_table, "source", source, "offset_", off)
            for tname, ep in (mirror_epochs or {}).items():
                sink._upsert(cur, MIRROR_TABLE, "table_name", tname, "epoch", ep)
        return results
