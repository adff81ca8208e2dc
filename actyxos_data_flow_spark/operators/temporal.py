"""Temporal joins: as-of (backward) and interval/range joins.

Spark has no ASOF JOIN operator; the naive rewrite — non-equi theta join
then keep the latest match — materializes every (probe, candidate) pair
before pruning, quadratic in per-key density. The distributed shape used
here is the union-merge: tag build rows 0 and probe rows 1, union, and
run ONE window per key ordered by (time, tag, tiebreak) carrying the
build columns forward with ``last(ignorenulls)``. Cost: a single shuffle
on the key + a per-key sort — the same price as any keyed window, with
no pair blow-up at any density. This is the classic sort-merge as-of
used by time-series stores; Spark's sort-based window gives it to us
without custom code.

Interval joins (point-in-range) get the dual treatment: a coarse
bucket equi-join prefilter so the range predicate only sees candidates
whose buckets overlap — turning O(|probe| x |ranges|) into an equi-join
plus a residual filter (see :func:`interval_join`).

The reference engine has no temporal joins (single-node, in-order delta
processing makes them a per-row closure instead); these exist for the
training-data side, where "attach the latest state/config/session as of
event time" is a staple.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_TAG = "__asof_side"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: each probe row picks up the build row with
    the greatest ``ts_col`` <= the probe's (inclusive), per ``keys``.

    Contract: both frames carry ``keys``, ``ts_col`` (mutually
    comparable), and — for deterministic tie-breaks among equal build
    timestamps — ``order_col`` (the greatest wins). All OTHER build
    columns are the carried payload and must not collide with probe
    column names (pre-alias them); they come back null when no build row
    precedes the probe row (left-join semantics). Null payload values in
    a build row are carried PAST (``last(ignorenulls)``) — keep payloads
    non-null.

    Physical plan: union the tagged sides, one shuffle on ``keys``, one
    per-key sort by (ts, side, order), ``last(...)`` forward-fill,
    filter to probe rows. No pair explosion at any per-key density."""
    keys = list(keys)
    shared = set(keys) | {ts_col} | ({order_col} if order_col else set())
    build_vals = [c for c in build.columns if c not in shared]
    probe_vals = [c for c in probe.columns if c not in shared]
    clash = set(build_vals) & set(probe_vals)
    if clash:
        raise ValueError(f"alias build payload columns; colliding: {sorted(clash)}")

    order_cols = [order_col] if order_col else []
    b = build.select(
        *keys,
        ts_col,
        *order_cols,
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_vals],
        *build_vals,
        F.lit(0).alias(_TAG),
    )
    p = probe.select(
        *keys,
        ts_col,
        *order_cols,
        *probe_vals,
        *[F.lit(None).cast(build.schema[c].dataType).alias(c) for c in build_vals],
        F.lit(1).alias(_TAG),
    )
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(_TAG).asc(), *[F.col(c).asc() for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = b.unionByName(p).select(
        *keys,
        ts_col,
        *order_cols,
        *probe_vals,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in build_vals],
        _TAG,
    )
    return filled.filter(F.col(_TAG) == 1).drop(_TAG)


def interval_join(
    points: DataFrame,
    ranges: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    range_start: str,
    range_end: str,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: point rows matched to every range row of
    the same ``keys`` with ``range_start <= point_ts < range_end``.

    Without ``bucket_width`` this is the plain key equi-join with the
    range residual — fine when keys are selective. With ``bucket_width``
    (same time unit as the columns) both sides get bucket ids — the
    point one, the range all buckets it overlaps — and the join becomes
    an equi-join on (keys, bucket) with the residual applied after: the
    scale path when single keys span many ranges, since a range is only
    replicated across the buckets it actually covers and candidate pairs
    are bounded by per-bucket density, not per-key density."""
    keys = list(keys)
    cond_cols = [getattr(points, k) == getattr(ranges, k) for k in keys]
    residual = (F.col(point_ts) >= F.col(range_start)) & (F.col(point_ts) < F.col(range_end))
    if bucket_width is None:
        cond = cond_cols[0]
        for c in cond_cols[1:]:
            cond = cond & c
        return points.join(ranges, cond & residual, how)

    if how != "inner":
        raise ValueError("bucketed interval_join supports inner joins only")
    # integer `div`, NOT `/`: float division of epoch-scale longs can
    # round a point sitting exactly on a bucket boundary into the
    # neighboring bucket, silently dropping its matches
    pb = points.withColumn("__bucket", F.expr(f"{point_ts} div {bucket_width}"))
    rb = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{range_start} div {bucket_width}"),
                # end is exclusive: a range ending exactly on a bucket
                # boundary does not reach into that bucket
                F.expr(f"({range_end} - 1) div {bucket_width}"),
            )
        ),
    )
    joined = pb.join(rb, on=keys + ["__bucket"], how=how).filter(residual)
    return joined.drop("__bucket")


def rolling_agg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_micros",
    val_col: str = "value",
    lookback_micros: int = 3_600_000_000,
) -> DataFrame:
    """Event-time rolling aggregate: per key, the mean/count of values
    in the trailing ``lookback_micros`` window ending at each row — a
    RANGE frame, so rows sharing a timestamp see the identical frame
    (deterministic under any shuffle order; a ROWS frame would not be).

    The mean sums DECIMAL-cast values (round-6 first), so the result is
    independent of intra-frame addition order — same convention as every
    oracled aggregate (functions/scalar.py rationale).

    Scale shape: one hash exchange on the key, per-partition sort by
    event time, single window pass. Keys are users/devices — high
    cardinality, so partitions stay balanced; there is no global sort.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-lookback_micros, 0)
    )
    d = F.expr(f"CAST(round({val_col}, 6) AS DECIMAL(18,6))")
    return df.select(
        "event_id",
        key_col,
        ts_col,
        F.col(val_col),
        F.count(F.lit(1)).over(w).alias("rolling_cnt"),
        (F.sum(d).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("rolling_avg"),
    )


def scd2(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_micros",
    order_tiebreak: str = "event_id",
    state_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: each state-bearing
    event opens a validity interval [ts, next event's ts); the last
    interval per key is open (valid_to NULL, is_current). Ordering ties
    break on ``order_tiebreak`` so the history is total-ordered and
    deterministic.

    Scale shape: one exchange on the key + per-key sort + a single
    ``lead`` window — the canonical CDC-to-history materialization;
    no self-join (the naive "join next row" form shuffles twice and
    explodes on duplicate timestamps)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    nxt = F.lead(F.col(ts_col)).over(w)
    return df.select(
        key_col,
        *state_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
