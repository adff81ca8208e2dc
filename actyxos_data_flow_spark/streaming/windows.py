"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no windows or watermarks (SURVEY.md: its outputs
treat time as data), but a Spark-native engine gets them for free and a
training-data ingest pipeline wants them (per-window arrival counts,
rate monitoring). This is the idiomatic Structured Streaming shape:
``withWatermark`` bounds how late an event may arrive — state for
closed windows is dropped, so memory is O(open windows × keys) at any
scale — tumbling/sliding windows come from ``F.window``, and append
mode emits each window exactly once, when the watermark passes its end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-(window, keys) event counts plus optional extra ``aggs`` over
    event time; late events beyond ``watermark`` are dropped."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(F.count(F.lit(1)).alias("n"), *aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session windows: per key, events closer than ``gap`` merge into
    one session spanning [first event, last event + gap). State is one
    open session per key (plus any not-yet-watermarked late ones) —
    Spark merges overlapping session windows at update time, and the
    watermark closes sessions so their state is dropped; append mode
    emits each session exactly once when it can no longer grow."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(F.count(F.lit(1)).alias("n"), *aggs)
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def windowed_distinct_hll(
    stream: DataFrame,
    ts_col: str,
    item_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Approximate distinct items per event-time window, as the HLL
    REGISTER table — (window_start, window_end, idx, r) — rather than
    a finished number: registers survive re-aggregation, so downstream
    can roll 1-minute windows into hours (groupBy + max) or merge
    shards, which a scalar estimate cannot. Streaming state per window
    is at most m=64 rows (the max-aggregate is the sketch's monoid),
    and the watermark evicts closed windows, so state is O(open
    windows × 64) no matter how many distinct items flow through —
    the exact reason windowed COUNT(DISTINCT) is unsupported in
    streaming and this is the scalable substitute. Estimate with
    operators/hll.hll_estimate grouped by the window columns."""
    from ..operators.hll import hll_proj_cols

    idx, rho = hll_proj_cols(item_col)
    regs = (
        stream.withWatermark(ts_col, watermark)
        .select(F.window(F.col(ts_col), window).alias("window"), idx, rho)
        .groupBy("window", "idx")
        .agg(F.max("rho").alias("r"))
    )
    return regs.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "idx",
        "r",
    )


def merge_session_state(
    state: "DataFrame | None",
    batch_sessions: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    max_broadcast_users: int = 1_000_000,
) -> DataFrame:
    """Incremental sessionization merge — the IVM step behind
    late-/out-of-order-arrival sessionization: fold a batch's
    mini-sessions (min event time, last event time, n_events) into the
    standing per-user session state. Two sessions merge when the later
    one STARTS strictly within gap of the earlier one's last event —
    exactly Spark's ``session_window`` break rule (new session iff
    diff >= gap), so folding arrival batches in ANY order converges to
    the same state as one batch pass over the fully-ordered stream:
    "same session" is the transitive closure of consecutive-gap < gap,
    an order-independent relation, and (min, max, sum) are its
    associative-commutative aggregates.

    Scale shape per batch: only TOUCHED users re-sessionize — the
    state is split by a semi/anti join on the batch's user set,
    untouched rows pass through untouched; the island window sorts
    only (touched users × their sessions), never the whole state.
    State stays one row per session: O(active sessions), the same
    bound Structured Streaming's session store keeps.

    The user-set join is broadcast only while the batch's distinct
    users fit ``max_broadcast_users`` (the cosine_topk query-matrix
    guard applied to the session merge): at ingest batch sizes the
    broadcast wins, but a BACKFILL-sized batch (a replay of months of
    history in one merge) would blow the broadcast limit — above the
    cap the hint is dropped and both splits run as shuffle
    semi/anti joins on the same key, correct at any batch size. The
    one count() action pricing the guard is per MERGE, not per row."""
    from pyspark.sql import Window

    cols = [user_col, "s_us", "last_us", "n_events"]
    b = batch_sessions.select(*cols)
    if state is None:
        merged_in = b
        untouched = None
    else:
        users = b.select(user_col).distinct()
        if users.count() <= max_broadcast_users:
            users = F.broadcast(users)
        touched = state.join(users, user_col, "semi")
        untouched = state.join(users, user_col, "anti")
        merged_in = touched.select(*cols).unionByName(b)
    w_prev = (
        Window.partitionBy(user_col)
        .orderBy(F.col("s_us").asc(), F.col("last_us").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(user_col)
        .orderBy(F.col("s_us").asc(), F.col("last_us").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_last = F.max("last_us").over(w_prev)
    brk = F.when(prev_last.isNull() | (F.col("s_us") >= prev_last + F.lit(gap_us)), 1).otherwise(0)
    islands = (
        merged_in.withColumn("_sid", F.sum(brk).over(w_run))
        .groupBy(user_col, "_sid")
        .agg(
            F.min("s_us").alias("s_us"),
            F.max("last_us").alias("last_us"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .drop("_sid")
    )
    return islands if untouched is None else islands.unionByName(untouched.select(*cols))
