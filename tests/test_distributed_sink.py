"""Distributed two-phase sink apply: executor-parallel staging +
one-transaction finalize, against a file-backed SQLite target (the
same shape a JDBC target gets with per-partition connections)."""

from __future__ import annotations

import sqlite3

import pyspark.sql.functions as F  # noqa: F401

from actyxos_data_flow_spark.sinks import DbColumn, DbTable, SqliteSink
from actyxos_data_flow_spark.sinks.dialect import SqliteDialect
from actyxos_data_flow_spark.sinks.distributed import DistributedApplier

T = DbTable(
    name="dist_records",
    columns=(DbColumn("a", "text", index=True), DbColumn("b", "bigint")),
    version=1,
)


def _factory(path):
    def connect():
        conn = sqlite3.connect(path, timeout=30.0)
        conn.execute("PRAGMA busy_timeout=30000")
        return conn

    return connect


def _setup(tmp_path):
    path = str(tmp_path / "dist.db")
    sink = SqliteSink(path)
    sink.ensure(T)
    applier = DistributedApplier(_factory(path), SqliteDialect())
    applier.ensure_stage(sink, T)
    return sink, applier


def test_stage_finalize_round_trip(spark, tmp_path):
    sink, applier = _setup(tmp_path)
    delta = spark.createDataFrame(
        [("x", 1, 2), ("y", 2, 1), ("z", 3, 3)], "a string, b long, delta long"
    ).repartition(4)
    applier.stage(delta, T, epoch="e1")
    ins, dels = applier.finalize(sink, T, "e1", {"src": 10})
    assert (ins, dels) == (6, 0)
    assert sink.rows(T) == [("x", 1)] * 2 + [("y", 2)] + [("z", 3)] * 3
    assert sink.read_offsets(T) == {"src": 10}

    # retractions (negative mult: delete exactly n) + a NULL key
    d2 = spark.createDataFrame(
        [("x", 1, -1), ("z", 3, -2), (None, 7, 1)], "a string, b long, delta long"
    ).repartition(2)
    applier.stage(d2, T, epoch="e2")
    ins, dels = applier.finalize(sink, T, "e2", {"src": 20})
    assert (ins, dels) == (1, 2)
    assert sink.rows(T) == [(None, 7), ("x", 1), ("y", 2), ("z", 3)]
    assert sink.read_offsets(T) == {"src": 20}
    sink.close()


def test_stage_task_retry_idempotent(spark, tmp_path):
    """Re-running stage for the same epoch (task retry / whole-stage
    retry) converges: each partition clears its own slice first."""
    sink, applier = _setup(tmp_path)
    delta = spark.createDataFrame(
        [("x", 1, 1), ("y", 2, 2)], "a string, b long, delta long"
    ).repartition(3)
    applier.stage(delta, T, epoch="e1")
    applier.stage(delta, T, epoch="e1")  # retry: no duplication
    ins, _ = applier.finalize(sink, T, "e1", {"src": 1})
    assert ins == 3
    assert sink.rows(T) == [("x", 1), ("y", 2), ("y", 2)]
    sink.close()


def test_finalize_clears_stage_in_same_txn(spark, tmp_path):
    sink, applier = _setup(tmp_path)
    delta = spark.createDataFrame([("x", 1, 1)], "a string, b long, delta long")
    applier.stage(delta, T, epoch="e1")
    applier.finalize(sink, T, "e1", {"src": 1})
    cur = sink.conn.cursor()
    cur.execute("SELECT count(*) FROM dist_records_stage")
    assert cur.fetchone()[0] == 0
    # a second finalize of the (now empty) epoch is a no-op
    ins, dels = applier.finalize(sink, T, "e1", {"src": 1})
    assert (ins, dels) == (0, 0)
    assert sink.rows(T) == [("x", 1)]
    sink.close()


def test_write_snapshots_with_distributed_applier(spark, tmp_path):
    """The full IVM loop (mirror diff -> delta -> apply) with the
    distributed staging topology instead of driver collect: same
    semantics as test_write_snapshot_ivm_loop, including idempotent
    retry (empty diff against the committed mirror stages nothing)."""
    from actyxos_data_flow_spark.sinks import SnapshotMirror
    from actyxos_data_flow_spark.sinks.writer import write_snapshots

    path = str(tmp_path / "wdist.db")
    sink = SqliteSink(path)
    sink.ensure(T)
    applier = DistributedApplier(_factory(path), SqliteDialect())
    mirror = SnapshotMirror(spark, str(tmp_path / "mirror"))

    snap1 = spark.createDataFrame([("x", 1), ("y", 2)], "a string, b long")
    n = write_snapshots(spark, sink, [(T, snap1)], {"src": 1}, mirror, applier=applier)
    assert n == {T.name: 2}
    assert sink.rows(T) == [("x", 1), ("y", 2)]
    assert sink.mirror_epoch(T.name) == "src-1"

    snap2 = spark.createDataFrame([("x", 1), ("z", 3)], "a string, b long")
    n = write_snapshots(spark, sink, [(T, snap2)], {"src": 2}, mirror, applier=applier)
    assert n == {T.name: 2}
    assert sink.rows(T) == [("x", 1), ("z", 3)]
    assert sink.read_offsets(T) == {"src": 2}

    # idempotent retry: empty diff, nothing staged or applied
    n = write_snapshots(spark, sink, [(T, snap2)], {"src": 2}, mirror, applier=applier)
    assert n == {T.name: 0}
    assert sink.rows(T) == [("x", 1), ("z", 3)]
    sink.close()


def test_stage_epoch_retry_with_different_partitioning(spark, tmp_path):
    """An epoch retried after a crash may partition its recomputed
    delta differently (AQE, config change): stage() must clear the
    WHOLE epoch first, or the prior attempt's orphan (epoch, partition)
    slices survive their per-partition deletes and finalize applies
    duplicates."""
    sink, applier = _setup(tmp_path)
    attempt1 = spark.createDataFrame(
        [("x", 1, 1), ("y", 2, 1), ("z", 3, 1), ("w", 4, 1)],
        "a string, b long, delta long",
    ).repartition(4)
    applier.stage(attempt1, T, epoch="e1")
    # crash before finalize; the retry computes a smaller delta that
    # lands in ONE partition — none of attempt 1's slices are touched
    # by per-partition deletes
    attempt2 = spark.createDataFrame(
        [("x", 1, 1)], "a string, b long, delta long"
    ).repartition(1)
    applier.stage(attempt2, T, epoch="e1")
    ins, dels = applier.finalize(sink, T, "e1", {"src": 5})
    assert (ins, dels) == (1, 0)
    assert sink.rows(T) == [("x", 1)]
    sink.close()


def test_auto_switch_to_staged_path_above_threshold(spark, tmp_path):
    """With a conn_factory supplied, a delta above the threshold must
    take the staged executor path automatically. Call-graph evidence:
    the stage table only exists if ensure_stage ran, and driver-side
    apply never creates it."""
    from actyxos_data_flow_spark.sinks import SnapshotMirror, SqliteSink
    from actyxos_data_flow_spark.sinks.writer import write_snapshots

    path = str(tmp_path / "auto.db")
    sink = SqliteSink(path)
    sink.ensure(T)
    mirror = SnapshotMirror(spark, str(tmp_path / "mirror"))
    snap = spark.range(50).selectExpr("concat('k', id) AS a", "id AS b")

    n = write_snapshots(
        spark, sink, [(T, snap)], {"src": 1}, mirror,
        conn_factory=_factory(path), distributed_threshold=10,
    )
    assert n["dist_records"] == 50
    tables = {
        r[0]
        for r in sink.conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        ).fetchall()
    }
    assert "dist_records_stage" in tables  # staged path engaged
    assert len(sink.rows(T)) == 50
    assert sink.read_offsets(T) == {"src": 1}

    # idempotent retry of the same epoch through the auto path
    n = write_snapshots(
        spark, sink, [(T, snap)], {"src": 1}, mirror,
        conn_factory=_factory(path), distributed_threshold=10,
    )
    assert n["dist_records"] == 0
    sink.close()


def test_small_delta_stays_on_driver_path(spark, tmp_path):
    """Below the threshold the driver-side apply runs even when a
    conn_factory is available — no stage table is ever created."""
    from actyxos_data_flow_spark.sinks import SnapshotMirror, SqliteSink
    from actyxos_data_flow_spark.sinks.writer import write_snapshots

    path = str(tmp_path / "small.db")
    sink = SqliteSink(path)
    sink.ensure(T)
    mirror = SnapshotMirror(spark, str(tmp_path / "mirror"))
    snap = spark.range(5).selectExpr("concat('k', id) AS a", "id AS b")

    n = write_snapshots(
        spark, sink, [(T, snap)], {"src": 1}, mirror,
        conn_factory=_factory(path), distributed_threshold=1000,
    )
    assert n["dist_records"] == 5
    tables = {
        r[0]
        for r in sink.conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        ).fetchall()
    }
    assert "dist_records_stage" not in tables
    assert len(sink.rows(T)) == 5
    sink.close()
