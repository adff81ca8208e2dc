"""Behavioral analytics over ``events``: ordered funnel conversion and
cohort retention (operators/behavior.py).

Timestamps cross the oracle boundary as epoch microseconds (``ns_micros``
on the Spark side, ``epoch_us`` in DuckDB — plans/temporal.py
convention). Both outputs are pure integers — counts, period indices,
micro lags — so the value hash needs no rounding convention at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ns_micros
from ..operators import behavior as B
from ..sources import load_table
from . import register

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_US = B.DAY_US  # 24 h anchored at funnel entry

FUNNEL_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events
),
s1 AS (
  SELECT user_id, min(tsu) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, s1.t1, min(e.tsu) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.tsu >= s1.t1 AND e.tsu <= s1.t1 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id, s1.t1
),
s3 AS (
  SELECT e.user_id, s2.t1, min(e.tsu) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.tsu >= s2.t2 AND e.tsu <= s2.t1 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id, s2.t1
)
SELECT 1 AS step_idx, 'view' AS step,
       (SELECT count(*) FROM s1) AS users, 0 AS sum_lag_micros
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM s2),
       (SELECT CAST(coalesce(sum(t2 - t1), 0) AS BIGINT) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM s3),
       (SELECT CAST(coalesce(sum(t3 - t1), 0) AS BIGINT) FROM s3)
"""


@register("funnel_conversion", oracle=FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase, 24 h conversion window
    anchored at the user's first view. One row per step: users reaching
    that depth and the exact summed lag from entry.

    The engine computes step times as a cascade of conditional
    min-aggregates co-partitioned on user_id (greedy-earliest matching,
    provably equivalent to sequence existence — see
    operators/behavior.funnel_user_steps); the oracle states the same
    cascade as correlated CTEs. No sequence sort, no window over the
    event stream, no pair explosion anywhere.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", ns_micros("ts").alias("ts_micros"), "event_type"
    )
    return B.funnel_report(events, FUNNEL_STEPS, FUNNEL_WINDOW_US)


COHORT_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {B.DAY_US} AS p
  FROM events
),
first AS (SELECT user_id, min(p) AS cohort_period FROM e GROUP BY user_id),
active AS (SELECT DISTINCT user_id, p FROM e)
SELECT f.cohort_period,
       a.p - f.cohort_period AS period_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
FROM active a JOIN first f USING (user_id)
GROUP BY f.cohort_period, period_offset
"""


@register("cohort_retention", oracle=COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix over the event stream: users
    bucketed by the day (epoch-micros integer DIV, calendar-free) of
    their first event, counted distinct in every day they return.
    ``period_offset = 0`` rows are cohort sizes. Daily rather than
    weekly periods because TESTDATA's event stream spans one month —
    weekly cells would all be saturated.

    Two user-keyed aggregates + one co-partitioned join; output is
    bounded by days² rows however large the corpus.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", ns_micros("ts").alias("ts_micros")
    )
    out = B.cohort_retention(events, period_us=B.DAY_US)
    return out.select(
        "cohort_period", "period_offset", F.col("users").cast("long").alias("users")
    )


# -- exponentially time-decayed engagement ---------------------------------

HALF_LIFE_US = 7 * B.DAY_US  # one-week half-life
import math as _math

_DECAY_RATE = repr(_math.log(2.0) / HALF_LIFE_US)  # folded identically
# into both engines (the PageRank teleport-constant trick)

DECAY_ORACLE = f"""
WITH de AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS tsm FROM events
),
dnow AS (SELECT max(tsm) AS now FROM de)
SELECT user_id, event_type,
       CAST(sum(CAST(round(value * exp(-CAST(dnow.now - tsm AS DOUBLE)
                                       * {_DECAY_RATE}), 7)
                     AS DECIMAL(28,9))) AS DOUBLE) AS decay_score,
       CAST(count(*) AS BIGINT) AS n_events,
       max(tsm) AS last_seen_micros
FROM de, dnow
GROUP BY 1, 2
"""


@register("events_decay_score", oracle=DECAY_ORACLE)
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement per (user, event_type):
    each event contributes value·2^(-age/half_life) with age measured
    from the corpus's max timestamp (a deterministic "now"), one-week
    half-life. The decay rate is ONE repr-folded double constant in
    both engines; each contribution is rounded to 7dp and summed as
    DECIMAL(28,9), so the aggregate is order-free and the hash exact.
    Plan: one scan (the "now" scalar is a 1-row aggregate folded as a
    literal), one map-side-combined hash aggregate — the streaming
    ingest gate maintains the same monoid incrementally, since
    exp-decay scores merge by plain addition once anchored to a fixed
    epoch."""
    base = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", ns_micros("ts").alias("tsm")
    )
    now = base.agg(F.max("tsm").alias("_m")).first()["_m"]
    contrib = F.expr(
        f"CAST(round(value * exp(-CAST({now} - tsm AS DOUBLE) * {_DECAY_RATE}), 7)"
        " AS DECIMAL(28,9))"
    )
    return base.groupBy("user_id", "event_type").agg(
        F.sum(contrib).cast("double").alias("decay_score"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("tsm").alias("last_seen_micros"),
    )
