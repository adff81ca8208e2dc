"""Stream-stream interval equi-join, packaged once for both runtimes.

The reference joins only within a grouped arrangement (G3,
/root/reference/src/flow.rs:465-596) because its time is the logical
epoch; EVENT-time correlation of two live streams is the
Structured-Streaming-native capability this module adds to the surface.
The same expression tree runs in batch (a range-predicated equi-join —
this is what the DuckDB oracle replays) and in streaming, where the
watermarks bound the join state: each side buffers only rows newer than
(other side's watermark − interval slack), so state is O(rate × slack),
not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same ``key`` and
    ``right_ts`` in ``(left_ts − lower, left_ts + upper]``-style bounds:
    concretely ``right_ts >= left_ts - INTERVAL lower`` AND
    ``right_ts < left_ts + INTERVAL upper`` (set either to "0 seconds"
    for a one-sided window). Columns from both sides survive; name
    collisions other than ``key`` must be resolved by the caller.

    On streaming inputs pass ``watermark`` (applied to BOTH time
    columns) — Spark requires it to bound join state and to emit
    outer-join NULL rows; on batch inputs the identical condition plans
    as a broadcast/sort-merge equi-join on ``key`` with the time bounds
    as a residual predicate (what the oracle replays)."""
    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)
    # rename the right key BEFORE joining: with outer joins, dropping
    # right[key] after the fact is ambiguous when both frames share
    # lineage, and keeping the wrong side NULLs the key on unmatched
    # rows — an explicit rename makes the surviving key the left's
    right = right.withColumnRenamed(key, "_ij_rkey")
    cond = (
        (left[key] == right["_ij_rkey"])
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (right[right_ts] < left[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how).drop("_ij_rkey")
