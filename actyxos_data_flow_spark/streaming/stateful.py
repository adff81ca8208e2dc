"""Keyed mutable state ACROSS micro-batches — the live-streaming form of
the reference's stateful closures (``FnMut``,
/root/reference/src/flow.rs:241-256) and stateful operators (E2's
pending-interval BTreeMap, /root/reference/examples/machine-usage/
logic.rs:28-54).

The batch engine never needs this: recompute-from-log rebuilds operator
state each epoch by replaying the prefix (SURVEY.md §4), which is what
``Flow.map_with_state`` does. In live mode replaying from offset 0 every
tick is wasted work, so here the SAME ``fn(state, row) -> (state, emit)``
fold runs under ``applyInPandasWithState``: Spark checkpoints the
per-key state between micro-batches and hands it back on the next one.
One fold contract, two execution regimes — batch replay and live
incremental — mirroring the reference's replay → live phase switch
(/root/reference/src/runner.rs:169-173).

State crosses the boundary as a tuple matching ``state_schema`` (None =
key never seen). Rows are folded in ``order_by`` order WITHIN a
micro-batch; cross-batch order is the stream's arrival order, as in the
reference's live phase.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from ..flow import _iter_rows
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def map_with_state(
    stream_df: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    output_schema: StructType | str,
    state_schema: StructType | str,
    order_by: Sequence[str] | None = None,
    init_state: tuple | None = None,
    done_state: tuple | None = None,
) -> DataFrame:
    """Fold ``fn`` over each key's rows with state persisted across
    micro-batches. ``fn(state, row) -> (state, emit)`` — the same
    contract as ``Flow.map_with_state``; ``state`` is a tuple matching
    ``state_schema`` (or ``init_state``/None before first update);
    ``emit`` is None, a dict for one output row, or a list of dicts
    (e.g. a retract/assert pair).

    ``done_state``: optional sentinel meaning "this key's state is
    equivalent to never-seen" — when the fold lands on it, the key's
    state-store entry is REMOVED instead of updated, so a long-running
    live query over one-shot keys (closed intervals, finished orders)
    keeps bounded state instead of one entry per key ever seen."""
    if isinstance(output_schema, StructType):
        out_cols = [f.name for f in output_schema.fields]
    else:
        out_cols = [s.strip().split()[0] for s in output_schema.split(",")]
    order_cols = list(order_by) if order_by else None

    def handler(key, pdf_iter, state: GroupState):
        s = tuple(state.get) if state.exists else init_state
        out = []
        # A key's rows can span several Arrow chunks (arrow
        # maxRecordsPerBatch), and chunks arrive in arbitrary order —
        # sorting per chunk would fold out of order. Concatenate the
        # whole group FIRST, sort once, then fold.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            if order_cols:
                whole = whole.sort_values(order_cols, kind="mergesort")
            for row in _iter_rows(whole):
                s, emit = fn(s, row)
                if emit is not None:
                    out.extend(emit if isinstance(emit, list) else [emit])
        if s is not None and s == done_state:
            if state.exists:
                state.remove()
        elif s is not None:
            state.update(s)
        yield pd.DataFrame(out, columns=out_cols)

    return (
        stream_df.groupBy(*keys)
        .applyInPandasWithState(
            handler,
            output_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def usage_intervals_stream(tagged: DataFrame) -> DataFrame:
    """E2 in live mode (/root/reference/examples/machine-usage/
    logic.rs:28-54): pair each 'stop' with the most recent unconsumed
    'start' of the same (user_id, order_id); a re-start overwrites the
    pending one; a stop without a pending start emits nothing. State is
    one pending-start timestamp per key — the reference's BTreeMap entry
    — persisted across micro-batches, so a start in one epoch pairs with
    a stop arriving epochs later without replay.

    ``tagged`` columns: user_id, order_id, kind ('start'|'stop'),
    ts_micros, event_id (fold order within a batch)."""

    def pair(state, row):
        open_ts = state[0] if state is not None else None
        if row.kind == "start":
            return (row.ts_micros,), None
        if open_ts is None:
            return (None,), None
        return (None,), {
            "user_id": row.user_id,
            "order_id": row.order_id,
            "started_micros": open_ts,
            "duration_micros": row.ts_micros - open_ts,
        }

    return map_with_state(
        tagged,
        ["user_id", "order_id"],
        pair,
        "user_id bigint, order_id bigint, started_micros bigint, duration_micros bigint",
        "open_ts bigint",
        order_by=["event_id"],
        # (None,) = "no pending start" ≡ never-seen: drop the state-store
        # entry so closed (user, order) keys don't accumulate forever
        done_state=(None,),
    )


def monotonic_max_by_stream(
    tagged: DataFrame,
    keys: Sequence[str],
    sort_col: str,
    record_cols: Sequence[str],
    record_schema: str,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """M1 in live mode (/root/reference/src/flow.rs:286-321): per key
    retain the max-by-``sort_col`` record ever seen; when a new record
    wins, emit the previous winner with delta −1 and the new one with
    delta +1 — the reference's exact retraction sequence
    (src/flow.rs:616-627), produced incrementally instead of by
    snapshot-diff. Ties resolve by full-record order, like the batch
    ``Flow.monotonic_max_by``. State = the current winner.

    ``record_schema`` is the comma schema of ``record_cols``; output
    appends ``delta int``."""
    fields = list(record_cols)
    si = fields.index(sort_col)

    def nskey(v):
        # None-safe comparison key, ordered like Rust's Option (None <
        # Some): comparing (False, None) with (True, x) decides on the
        # bool and never touches None vs x (which raises in Python)
        return (v is not None, v)

    def okey(rec: tuple):
        return (nskey(rec[si]), tuple(nskey(v) for v in rec))

    def step(state, row):
        rec = tuple(getattr(row, c) for c in fields)
        cur = tuple(state) if state is not None else None
        if cur is None:
            return rec, {**dict(zip(fields, rec)), "delta": 1}
        if okey(rec) > okey(cur):
            return rec, [
                {**dict(zip(fields, cur)), "delta": -1},
                {**dict(zip(fields, rec)), "delta": 1},
            ]
        return cur, None

    return map_with_state(
        tagged,
        keys,
        step,
        record_schema + ", delta int",
        record_schema,
        order_by=order_by,
    )


# -- transformWithState runtime (the newer keyed-state API) ------------------
#
# Spark 4 ships a second keyed-state runtime: ``transformWithStateInPandas``
# (StatefulProcessor + typed state handles, RocksDB-backed, timers,
# TTL). Same fold contract as :func:`map_with_state` so pipelines can
# switch runtimes without touching operator logic; prefer this one on
# clusters where the state store outgrows memory — value state lives in
# RocksDB rather than the executor heap.
#
# Runtime dependency: the TWS state-channel protocol speaks protobuf
# (pyspark.sql.streaming.proto) — requires the ``protobuf`` package on
# driver and executors. The pytest gates on its presence
# (tests/test_stateful.py::test_tws_runtime_same_fold_cross_batch).


def map_with_state_tws(
    stream_df: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    output_schema: StructType | str,
    state_schema: StructType | str,
    order_by: Sequence[str] | None = None,
    init_state: tuple | None = None,
) -> DataFrame:
    """:func:`map_with_state` on the ``transformWithStateInPandas``
    runtime. ``fn(state, row) -> (state, emit)`` exactly as there; state
    is a tuple matching ``state_schema``, persisted in the operator's
    value-state handle across micro-batches."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    if isinstance(output_schema, StructType):
        out_cols = [f.name for f in output_schema.fields]
    else:
        out_cols = [s.strip().split()[0] for s in output_schema.split(",")]
    state_struct = (
        state_schema
        if isinstance(state_schema, StructType)
        else T._parse_datatype_string(state_schema)
    )
    order_cols = list(order_by) if order_by else None

    class _FoldProcessor(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("fold", state_struct)

        def handleInputRows(self, key, rows, timerValues):
            s = tuple(self._state.get()) if self._state.exists() else init_state
            out = []
            # concatenate ALL chunks before sorting — a key spanning
            # multiple Arrow chunks must fold in global order_by order
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
                if order_cols:
                    whole = whole.sort_values(order_cols, kind="mergesort")
                for row in _iter_rows(whole):
                    s, emit = fn(s, row)
                    if emit is not None:
                        out.extend(emit if isinstance(emit, list) else [emit])
            if s is not None:
                self._state.update(s)
            yield pd.DataFrame(out, columns=out_cols)

        def close(self):
            pass

    return stream_df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_FoldProcessor(),
        outputStructType=output_schema,
        outputMode="Append",
        timeMode="None",
    )
