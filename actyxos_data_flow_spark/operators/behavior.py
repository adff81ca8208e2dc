"""Behavioral / sequence analytics over event streams: ordered funnels
and cohort retention.

The reference engine's whole domain is live event streams feeding
dashboards (machine state, usage intervals — see
/root/reference/src/flow.rs and the examples' dashboard exports); funnel
conversion and cohort retention are the canonical user-facing questions
over exactly that shape of data, so they belong in the engine's
first-class surface alongside sessionization (operators/temporal.py).

Scale shape (both operators): every aggregate and join is keyed on
``user_id`` — Catalyst co-partitions the whole cascade on one exchange
key, so at 100 TB the event table shuffles by user once and each further
stage reuses that partitioning. There is NO unpartitioned window and no
per-user collect: step times come from conditional min-aggregates, not
from sorting whole user histories.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

DAY_US = 86_400 * 1_000_000
WEEK_US = 7 * DAY_US


def funnel_user_steps(
    events: DataFrame,
    steps: Sequence[str],
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_micros",
    type_col: str = "event_type",
    strict: bool = False,
) -> list[DataFrame]:
    """Ordered-funnel step times per user.

    Returns one DataFrame per funnel depth k: users whose history
    contains ``steps[0] <= ... <= steps[k-1]`` in order, where each step
    time is the EARLIEST qualifying occurrence (>= the previous step's
    chosen time) and the whole sequence must land within ``window_us``
    of the first step ("conversion window anchored at entry" — the
    standard product-analytics semantics). Frame k carries columns
    ``(user_col, t1, ..., tk)``.

    Tie semantics — a DELIBERATE choice, stated here because it
    deviates from strictly-increasing funnels: with the default
    ``strict=False``, step i may match at the IDENTICAL timestamp as
    step i−1 (``>=``). Events logged in the same microsecond have no
    defined order in the log, so treating "same instant" as "in order"
    keeps the matcher deterministic and order-free where a strict
    matcher would silently depend on ingestion tie-breaks; it also
    mirrors SQL ``MATCH_RECOGNIZE``-over-equal-timestamps behavior.
    Pass ``strict=True`` for the strictly-increasing variant
    (``ts > t_{i-1}`` for every step i>1); the greedy-earliest argument
    below holds unchanged under either comparator.

    Greedy-earliest is the correct matcher here: taking the minimal
    qualifying time at every step dominates any other choice (an
    exchange argument — a later pick can only shrink the remaining
    window), so "exists an ordered chain in the window" iff the greedy
    chain completes. That is what lets each step be a conditional
    min-aggregate instead of a sequence scan.

    Each step is one filter + equi-join on ``user_col`` + min-aggregate;
    no windows, no explode, no per-user sort.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frames: list[DataFrame] = []
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    frames.append(cur)
    for i, step in enumerate(steps[1:], start=2):
        prev_ts = [f"t{j}" for j in range(1, i)]
        after_prev = (
            F.col(ts_col) > F.col(f"t{i-1}")
            if strict
            else F.col(ts_col) >= F.col(f"t{i-1}")
        )
        cur = (
            events.filter(F.col(type_col) == step)
            .join(cur, user_col)
            .filter(after_prev & (F.col(ts_col) <= F.col("t1") + F.lit(window_us)))
            .groupBy(user_col, *prev_ts)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        frames.append(cur)
    return frames


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_micros",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion report: one row per step with the number of
    users reaching it and the exact total lag from funnel entry.

    Columns: ``step_idx`` (1-based), ``step`` (event type),
    ``users`` (distinct users reaching this depth),
    ``sum_lag_micros`` (SUM of ``t_k - t1`` over those users — exact
    BIGINT, deliberately NOT an average: an integer sum is order-free
    and hashes identically on any engine, while a quotient would pin a
    rounding convention).

    Each report row is a scalar aggregate over its step frame; the
    union is K single-row branches sharing the user-keyed exchange.
    """
    frames = funnel_user_steps(events, steps, window_us, user_col, ts_col, type_col)
    rows = []
    for i, (step, frame) in enumerate(zip(steps, frames), start=1):
        lag = (F.col(f"t{i}") - F.col("t1")) if i > 1 else F.lit(0).cast("long")
        rows.append(
            frame.agg(
                F.count(F.lit(1)).alias("users"),
                F.coalesce(F.sum(lag), F.lit(0)).cast("long").alias("sum_lag_micros"),
            ).select(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                "users",
                "sum_lag_micros",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    events: DataFrame,
    period_us: int = WEEK_US,
    user_col: str = "user_id",
    ts_col: str = "ts_micros",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the period of their
    FIRST event (any type), counted in every later period they were
    active.

    Columns: ``cohort_period`` (epoch-micros integer-DIV period index of
    the user's first event), ``period_offset`` (periods since cohort
    entry, 0 = the entry period), ``users`` (distinct active users).
    The ``period_offset = 0`` row is the cohort's size.

    Period indexing is integer division on epoch micros — no calendar
    functions, so every engine agrees bit-for-bit (post-1970 data;
    floor-div == truncation there).

    Shape: one min-aggregate (first event per user), one distinct on
    (user, period) — both keyed on ``user_col`` — then a co-partitioned
    join and a count-distinct keyed on the (cohort, offset) pair. The
    matrix is at most periods² rows regardless of corpus size.
    """
    # integer DIV, not double division: epoch micros ~1.7e15 exceed
    # double's exact-integer range at the ulp level once multiplied out
    e = events.select(user_col, F.expr(f"{ts_col} DIV {period_us}").alias("_period"))
    first = e.groupBy(user_col).agg(F.min("_period").alias("cohort_period"))
    active = e.distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_period",
            (F.col("_period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.countDistinct(user_col).alias("users"))
    )
