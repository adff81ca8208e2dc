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

    Tie semantics: both engines use ``>=`` between consecutive steps —
    two steps may be satisfied at the identical microsecond (the
    documented default of funnel_user_steps; strict=True gives the
    strictly-increasing variant). The oracle's ``tsu >= s1.t1`` /
    ``tsu >= s2.t2`` mirrors the same choice, so the hash gate also
    pins it.
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


# -- first-order Markov transitions over per-user event sequences ----------

MARKOV_ORACLE = """
WITH me AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsm, event_id FROM events
),
mseq AS (
  SELECT user_id, event_type AS to_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY tsm ASC, event_id ASC
         ) AS from_type
  FROM me
),
mcnt AS (
  SELECT from_type, to_type, count(*) AS n FROM mseq
  WHERE from_type IS NOT NULL GROUP BY 1, 2
),
mtot AS (SELECT from_type, sum(n) AS tot FROM mcnt GROUP BY 1)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       (c.n * 1000000) // CAST(t.tot AS BIGINT) AS prob_fp6
FROM mcnt c JOIN mtot t USING (from_type)
"""


@register("events_markov_transitions", oracle=MARKOV_ORACLE)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over each user's event sequence:
    counts and row-normalized probabilities for every observed
    (from_type -> to_type) transition, sequence order = (ts, event_id).
    The lag window partitions by user_id — per-user state never
    crosses executors and there is no global sort; the transition
    matrix itself is |event types|² rows, so everything after the one
    windowed scan is model-sized. Probabilities are fp6 integers
    ((n·10^6) DIV total — exact rational quotients through round()
    were the round-7 cross-engine hazard).
    The sequence-mining sibling of the funnel row: where the funnel
    asks "does the ordered chain complete", this measures the full
    empirical transition structure."""
    base = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ns_micros("ts").alias("tsm"), "event_id"
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("user_id").orderBy(F.col("tsm").asc(), F.col("event_id").asc())
    seq = base.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) DIV _tot").alias("prob_fp6"),
    )
