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
