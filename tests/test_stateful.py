"""Keyed-state surface tests: the batch fold (Flow.map_with_state,
filter_mut/map_mut callable forms) and the cross-micro-batch streaming
fold (applyInPandasWithState), with E2 run live over two epochs in the
reference's golden-delta harness style
(/root/reference/src/flow.rs:616-640: feed a batch, assert the exact
emission sequence)."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from actyxos_data_flow_spark.flow import Flow
from actyxos_data_flow_spark.streaming.stateful import usage_intervals_stream


def test_map_with_state_batch_fold_order_and_state(spark):
    """Per-key ordered fold: emit-on-change (the canonical FnMut use)."""
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (2, 1, "a"), (1, 4, "b")],
        "k long, seq long, v string",
    )

    def on_change(state, row):
        return row.v, ({"k": row.k, "seq": row.seq, "v": row.v} if row.v != state else None)

    got = (
        Flow(df)
        .map_with_state(["k"], on_change, "k long, seq long, v string", order_by=["seq"])
        .df.collect()
    )
    assert sorted((r.k, r.seq, r.v) for r in got) == [
        (1, 1, "a"),
        (1, 3, "b"),
        (2, 1, "a"),
    ]


def test_filter_mut_callable_dedupes_consecutive(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 10), (1, 3, 20), (1, 4, 10)], "k long, seq long, v long"
    )

    def changed(state, row):
        return row.v, row.v != state

    got = Flow(df).filter_mut(fn=changed, keys=["k"], order_by=["seq"]).df.collect()
    assert sorted((r.seq, r.v) for r in got) == [(1, 10), (3, 20), (4, 10)]


def test_map_mut_callable_running_delta(spark):
    df = spark.createDataFrame([(1, 1, 5), (1, 2, 9), (1, 3, 2)], "k long, seq long, v long")

    def delta(state, row):
        prev = state if state is not None else 0
        return row.v, {"k": row.k, "seq": row.seq, "d": row.v - prev}

    got = (
        Flow(df)
        .map_mut(fn=delta, schema="k long, seq long, d long", keys=["k"], order_by=["seq"])
        .df.collect()
    )
    assert sorted((r.seq, r.d) for r in got) == [(1, 5), (2, 4), (3, -7)]


def test_e2_streaming_two_epoch_golden_deltas(spark, tmp_path):
    """E2 live over two micro-batches: epoch 1 opens intervals (two
    starts on one key — the second overwrites — plus an unmatched stop),
    epoch 2 closes one. Exact per-epoch emission sequence:
    epoch 1 → [] ; epoch 2 → [(1, 1, 200, 300)]. The pairing uses state
    carried ACROSS the batch boundary (started in epoch 1, emitted in
    epoch 2) — the thing batch recompute gets by replay and live mode
    must get from the state store."""
    src = str(tmp_path / "src")
    schema = "user_id long, order_id long, kind string, ts_micros long, event_id long"
    e1 = spark.createDataFrame(
        [
            (1, 1, "start", 100, 1),
            (1, 1, "start", 200, 2),  # re-start overwrites pending 100
            (2, 1, "stop", 50, 3),  # no pending start: emits nothing
        ],
        schema,
    )
    e2 = spark.createDataFrame([(1, 1, "stop", 500, 4), (2, 1, "start", 600, 5)], schema)
    e1.coalesce(1).write.parquet(src + "/epoch=1")
    e2.coalesce(1).write.parquet(src + "/epoch=2")
    # file source orders batches by mtime: pin epoch 1 strictly earlier
    now = time.time()
    for d, t in ((src + "/epoch=1", now - 60), (src + "/epoch=2", now)):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (t, t))

    stream = (
        spark.readStream.schema(e1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/epoch=*")
    )
    out = usage_intervals_stream(stream)

    per_batch: dict[int, list[tuple]] = {}

    def record(batch_df, batch_id):
        per_batch[batch_id] = sorted(tuple(r) for r in batch_df.collect())

    q = (
        out.writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(per_batch) == [0, 1]
    assert per_batch[0] == []
    assert per_batch[1] == [(1, 1, 200, 300)]


def test_m1_streaming_golden_retraction_sequence(spark, tmp_path):
    """The reference's monotonic_max_by harness run LIVE
    (/root/reference/src/flow.rs:616-627): batches [1], [1], [11, 2],
    [6, 7] keyed on value % 5 must emit exactly
    [+1], [], [(1,−1), (11,+1), (2,+1)], [(2,−1), (7,+1)] — winners
    carried across micro-batches in the state store."""
    from actyxos_data_flow_spark.streaming.stateful import monotonic_max_by_stream

    src = str(tmp_path / "src")
    batches = [[1], [1], [11, 2], [6, 7]]
    now = time.time()
    for i, vals in enumerate(batches):
        d = src + f"/b={i}"
        spark.createDataFrame([(v % 5, v) for v in vals], "k long, value long").coalesce(
            1
        ).write.parquet(d)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now - 60 + i, now - 60 + i))

    stream = (
        spark.readStream.schema("k long, value long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    out = monotonic_max_by_stream(
        stream, ["k"], "value", ["value"], "value long", order_by=["value"]
    )

    per_batch: dict[int, list[tuple]] = {}

    def record(batch_df, batch_id):
        per_batch[batch_id] = sorted(tuple(r) for r in batch_df.collect())

    q = (
        out.writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert per_batch[0] == [(1, 1)]
    assert per_batch[1] == []
    assert per_batch[2] == [(1, -1), (2, 1), (11, 1)]
    assert per_batch[3] == [(2, -1), (7, 1)]


def test_tws_runtime_same_fold_cross_batch(spark, tmp_path):
    """The transformWithStateInPandas runtime runs the SAME fold with
    the same cross-batch semantics: E2's pairing over two epochs emits
    [] then [(1, 1, 200, 300)] exactly as the applyInPandasWithState
    path above — one fold contract, two state runtimes."""
    import pytest

    pytest.importorskip(
        "google.protobuf", reason="transformWithState's state channel requires protobuf"
    )
    from actyxos_data_flow_spark.streaming.stateful import map_with_state_tws

    src = str(tmp_path / "src")
    schema = "user_id long, order_id long, kind string, ts_micros long, event_id long"
    e1 = spark.createDataFrame(
        [(1, 1, "start", 100, 1), (1, 1, "start", 200, 2), (2, 1, "stop", 50, 3)], schema
    )
    e2 = spark.createDataFrame([(1, 1, "stop", 500, 4), (2, 1, "start", 600, 5)], schema)
    e1.coalesce(1).write.parquet(src + "/epoch=1")
    e2.coalesce(1).write.parquet(src + "/epoch=2")
    now = time.time()
    for d, t in ((src + "/epoch=1", now - 60), (src + "/epoch=2", now)):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (t, t))

    stream = (
        spark.readStream.schema(e1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/epoch=*")
    )

    def pair(state, row):
        open_ts = state[0] if state is not None else None
        if row.kind == "start":
            return (row.ts_micros,), None
        if open_ts is None:
            return None, None
        return (None,), {
            "user_id": row.user_id,
            "order_id": row.order_id,
            "started_micros": open_ts,
            "duration_micros": row.ts_micros - open_ts,
        }

    out = map_with_state_tws(
        stream,
        ["user_id", "order_id"],
        pair,
        "user_id bigint, order_id bigint, started_micros bigint, duration_micros bigint",
        "open_ts bigint",
        order_by=["event_id"],
    )

    per_batch: dict[int, list[tuple]] = {}

    def record(batch_df, batch_id):
        per_batch[batch_id] = sorted(tuple(r) for r in batch_df.collect())

    q = (
        out.writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(per_batch) == [0, 1]
    assert per_batch[0] == []
    assert per_batch[1] == [(1, 1, 200, 300)]
