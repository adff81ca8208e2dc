"""Temporal-join queries over ``events`` (operators/temporal.py).

Timestamps cross the oracle boundary as epoch microseconds
(``ns_micros`` on the Spark side, ``epoch_us`` in DuckDB — same
convention as plans/reference.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ns_micros
from ..operators import temporal as TJ
from ..sources import load_table
from . import register


ASOF_ORACLE = """
WITH base AS (
  SELECT event_id, epoch_us(ts) AS ts_micros, user_id, event_type, value FROM events
),
clicks AS (SELECT user_id, ts_micros AS cts, event_id AS cid FROM base WHERE event_type = 'click'),
purch AS (SELECT event_id, user_id, ts_micros, value FROM base WHERE event_type = 'purchase'),
j AS (
  SELECT p.event_id, p.user_id, p.ts_micros, p.value, c.cts, c.cid,
         row_number() OVER (
           PARTITION BY p.event_id ORDER BY c.cts DESC NULLS LAST, c.cid DESC
         ) AS rn
  FROM purch p LEFT JOIN clicks c ON c.user_id = p.user_id AND c.cts <= p.ts_micros
)
SELECT event_id, user_id, ts_micros, value, cts AS click_micros, cid AS click_id
FROM j WHERE rn = 1
"""


@register("asof_latest_click", oracle=ASOF_ORACLE)
def asof_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase picks up the user's latest
    click at-or-before it (null if none — left semantics). The oracle
    says it with a theta join + rank (quadratic per user); the engine
    runs the union-merge window — one shuffle on user_id, one sort, no
    pair explosion — and must produce identical rows, ties (equal click
    timestamps) resolved to the max click_id on both sides."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id", ns_micros("ts").alias("ts_micros"), "user_id", "event_type", "value"
    )
    build = base.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_micros",
        "event_id",
        F.col("ts_micros").alias("click_micros"),
        F.col("event_id").alias("click_id"),
    )
    probe = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_micros", "event_id", "value"
    )
    out = TJ.asof_join(probe, build, ["user_id"], "ts_micros", order_col="event_id")
    return out.select("event_id", "user_id", "ts_micros", "value", "click_micros", "click_id")


HALF_HOUR_US = 30 * 60 * 1_000_000

INTERVAL_ORACLE = f"""
WITH base AS (
  SELECT event_id, epoch_us(ts) AS ts_micros, user_id, event_type FROM events
),
err AS (
  SELECT user_id, event_id AS err_id, ts_micros AS r_start, ts_micros + {HALF_HOUR_US} AS r_end
  FROM base WHERE event_type = 'error'
),
clk AS (SELECT user_id, ts_micros FROM base WHERE event_type = 'click')
SELECT e.err_id, e.user_id, count(*) AS n_clicks
FROM err e JOIN clk c
  ON c.user_id = e.user_id AND c.ts_micros >= e.r_start AND c.ts_micros < e.r_end
GROUP BY e.err_id, e.user_id
"""


@register("interval_clicks_after_error", oracle=INTERVAL_ORACLE)
def interval_clicks_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: clicks landing inside the half-hour
    window after each error, counted per error. The engine buckets both
    sides at the window width so the range predicate only sees
    candidates from overlapping buckets — an equi-join on (user, bucket)
    plus residual, never the full per-user cross product the oracle's
    theta join implies."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id", ns_micros("ts").alias("ts_micros"), "user_id", "event_type"
    )
    ranges = base.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        F.col("ts_micros").alias("r_start"),
        (F.col("ts_micros") + HALF_HOUR_US).alias("r_end"),
    )
    points = base.filter(F.col("event_type") == "click").select("user_id", "ts_micros")
    joined = TJ.interval_join(
        points, ranges, ["user_id"], "ts_micros", "r_start", "r_end", bucket_width=HALF_HOUR_US
    )
    return joined.groupBy("err_id", "user_id").agg(F.count(F.lit(1)).alias("n_clicks"))


# -- Sessionization (batch form of streaming/windows.session_agg) ----------

SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_ORACLE = f"""
WITH base AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
o AS (
  SELECT user_id, tsu,
         CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM base
),
s AS (
  SELECT user_id, tsu,
         sum(brk) OVER (PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       min(tsu) AS session_start_micros,
       max(tsu) + {SESSION_GAP_US} AS session_end_micros,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@register("session_windows", oracle=SESSION_ORACLE)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap, computed with
    the native ``session_window`` aggregate (one shuffle on user_id,
    sessions merged inside the aggregate — no self-join, no window-sort
    pass). The oracle derives the same islands with lag + running sum:
    a new session starts when the gap is >= 30 min (session end is
    exclusive: last event + gap), Spark's session-window rule."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", ns_micros("ts").alias("ts_micros")
    )
    sess = ev.groupBy(
        "user_id",
        F.session_window(F.timestamp_micros(F.col("ts_micros")), "30 minutes"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sess.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_micros"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_micros"),
        "n_events",
    )


# -- out-of-order arrival sessionization (IVM replay) ------------------------

LATE_N_BATCHES = 5
LATE_SALT = "latearrival:1"


@register("stream_latebound_sessionize", oracle=SESSION_ORACLE)
def stream_latebound_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization under MAXIMALLY out-of-order arrival: the event
    stream is replayed as salted-hash arrival batches (so every batch
    carries events from the whole time range — late data by
    construction), and each batch folds into a standing per-user
    session state via streaming.windows.merge_session_state — batch
    mini-sessions merged into islands on the same >= gap break rule as
    session_window. After the replay the state must be BIT-IDENTICAL
    to the one-pass batch sessionization (the same oracle as
    session_windows): the merge relation is order-independent and its
    aggregates associative-commutative, so arrival order cannot leak
    into the result. This is the session analog of the CDC replay
    rows' exactly-once contract; Structured Streaming's session store
    keeps the same O(active sessions) state this fold does.

    Scale shape per batch: sessionize the BATCH (one session_window
    agg), then merge touching users only (broadcast semi/anti split of
    the state); localCheckpoint is the per-batch commit point."""
    from ..streaming.windows import merge_session_state

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", ns_micros("ts").alias("tsu")
    )
    arrival = F.pmod(
        F.xxhash64(F.concat(F.lit(LATE_SALT + ":"), F.col("event_id").cast("string"))),
        F.lit(LATE_N_BATCHES),
    )
    ev = ev.withColumn("_arr", arrival)
    state = None
    for b in range(LATE_N_BATCHES):
        batch = ev.filter(F.col("_arr") == b)
        mini = (
            batch.groupBy(
                "user_id",
                F.session_window(F.timestamp_micros(F.col("tsu")), "30 minutes"),
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_micros(F.col("session_window.start")).alias("s_us"),
                (F.unix_micros(F.col("session_window.end")) - SESSION_GAP_US).alias("last_us"),
                "n_events",
            )
        )
        state = merge_session_state(state, mini, SESSION_GAP_US).localCheckpoint()
    return state.select(
        "user_id",
        F.col("s_us").alias("session_start_micros"),
        (F.col("last_us") + SESSION_GAP_US).alias("session_end_micros"),
        "n_events",
    )


ROLLING_ORACLE = """
WITH rbase AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_micros, value FROM events
  WHERE event_type = 'view'
)
SELECT event_id, user_id, ts_micros, value,
       count(*) OVER w AS rolling_cnt,
       CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(*) OVER w AS rolling_avg
FROM rbase
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts_micros
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


@register("rolling_hourly_avg", oracle=ROLLING_ORACLE, bench=True)
def rolling_hourly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour mean of 'view' values per user at every event —
    RANGE event-time frame (frame membership by timestamp VALUE, so
    duplicate-ts rows agree), decimal-exact mean."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("event_id", "user_id", ns_micros("ts").alias("ts_micros"), "value")
    )
    return TJ.rolling_agg(ev)


SCD2_ORACLE = """
WITH sbase AS (
  SELECT user_id, value, epoch_us(ts) AS ts_micros, event_id FROM events
  WHERE event_type = 'signup'
)
SELECT user_id, value,
       ts_micros AS valid_from,
       lead(ts_micros) OVER (PARTITION BY user_id ORDER BY ts_micros, event_id) AS valid_to,
       lead(ts_micros) OVER (PARTITION BY user_id ORDER BY ts_micros, event_id) IS NULL AS is_current
FROM sbase
"""


@register("scd2_user_history", oracle=SCD2_ORACLE)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of per-user 'signup' states: [ts, next ts) validity
    intervals via one lead window, open tail flagged current."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "value", ns_micros("ts").alias("ts_micros"), "event_id")
    )
    return TJ.scd2(ev)


# -- windowed distinct (HLL registers), batch replay -------------------------
#
# streaming/windows.windowed_distinct_hll is the scalable substitute for
# the (unsupported) streaming windowed COUNT(DISTINCT): per event-time
# window it keeps at most m=64 register rows (max is the sketch's
# monoid), so state is O(open windows x 64) regardless of item flow.
# The window/register arithmetic is identical in batch mode (streaming
# only adds watermark eviction, pytest-covered), so this row puts the
# SAME function under the DuckDB value hash: daily windows over events,
# distinct user_id per window, estimate + exact + 3-sigma contract all
# hashed. Window starts cross the oracle boundary as epoch micros
# (TZ-independent on both engines: Spark buckets internal epoch micros,
# DuckDB date_trunc's the NTZ value whose epoch_us is the same number).

_HLL_BOUND = 3 * 1.04 / 8.0  # 3 sigma at m=64

_WIN_ITEMS_SQL = """
  SELECT epoch_us(date_trunc('day', ts)) AS g, CAST(user_id AS VARCHAR) AS item
  FROM events WHERE user_id IS NOT NULL
"""

WINDOWED_HLL_ORACLE = None  # assigned below (needs operators.hll import)


def _windowed_hll_oracle() -> str:
    from ..operators import hll as H

    return f"""
WITH {H.hll_oracle_cte(_WIN_ITEMS_SQL)},
wexact AS (
  SELECT epoch_us(date_trunc('day', ts)) AS g,
         count(DISTINCT CAST(user_id AS VARCHAR)) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT x.g AS win_us, x.exact_distinct, e.hll_est,
       abs(e.hll_est - x.exact_distinct) <= {_HLL_BOUND!r} * x.exact_distinct AS within_3se
FROM wexact x JOIN hest e USING (g)
"""


WINDOWED_HLL_ORACLE = _windowed_hll_oracle()


@register("windowed_distinct_hll_replay", oracle=WINDOWED_HLL_ORACLE)
def windowed_distinct_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user estimates from the streaming operator's
    register tables, replayed in batch: windowed_distinct_hll buckets
    (window, idx, max rho), hll_estimate folds the registers per
    window, and the exact count joins in for the hashed 3-sigma
    accuracy contract."""
    from ..operators import hll as H
    from ..streaming.windows import windowed_distinct_hll

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    evt = ev.select(
        F.timestamp_micros(ns_micros("ts")).alias("ts2"),
        F.col("user_id").cast("string").alias("item"),
    )
    regs = windowed_distinct_hll(evt, "ts2", "item", window="1 day", watermark="2 days")
    est = H.hll_estimate(regs, "window_start")
    exact = evt.groupBy(
        F.window(F.col("ts2"), "1 day")["start"].alias("window_start")
    ).agg(F.countDistinct("item").alias("exact_distinct"))
    err = F.abs(F.col("hll_est") - F.col("exact_distinct"))
    return exact.join(est, "window_start").select(
        F.unix_micros(F.col("window_start")).alias("win_us"),
        "exact_distinct",
        "hll_est",
        (err <= F.lit(_HLL_BOUND) * F.col("exact_distinct")).alias("within_3se"),
    )


# -- stream-stream interval join (last-click attribution), batch replay ------
#
# streaming/joins.interval_join is the packaged stream-stream event-time
# join (watermark-bounded state; pytest drives it through two real file
# streams with availableNow). The join CONDITION is identical in batch,
# so this row puts the same operator under the DuckDB value hash:
# last-click attribution — every purchase joined to the same user's
# clicks in the preceding hour, keep the latest qualifying click.

ATTRIBUTION_ORACLE = """
WITH pj AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us,
         c.event_id AS click_id,
         row_number() OVER (
           PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM events p
  JOIN events c
    ON c.user_id = p.user_id
   AND c.event_type = 'click' AND p.event_type = 'purchase'
   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
)
SELECT purchase_id, user_id, purchase_us, click_id, click_us,
       purchase_us - click_us AS gap_us
FROM pj WHERE rn = 1
"""


@register("stream_attribution_replay", oracle=ATTRIBUTION_ORACLE)
def stream_attribution_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-click attribution through streaming.joins.interval_join in
    batch mode: purchases joined to the same user's clicks in the
    preceding hour (the stream-stream interval-join shape — in
    streaming the watermark bounds both sides' state; the condition and
    therefore the answer are identical), then one bounded per-purchase
    window keeps the latest qualifying click. The hashed output carries
    the attribution gap in micros."""
    from pyspark.sql import Window

    from ..streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.timestamp_micros(ns_micros("ts")).alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.timestamp_micros(ns_micros("ts")).alias("c_ts"),
    )
    j = interval_join(
        purchases, clicks, key="user_id",
        left_ts="p_ts", right_ts="c_ts",
        lower="1 HOUR", upper="0 SECONDS",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("p_ts").alias("purchase_us"),
            "click_id",
            F.unix_micros("c_ts").alias("click_us"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
    )


ATTRIBUTION_OUTER_ORACLE = """
WITH pj AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us,
         c.event_id AS click_id,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
         ) AS rn
  FROM events p
  LEFT JOIN events c
    ON c.user_id = p.user_id
   AND c.event_type = 'click'
   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
  WHERE p.event_type = 'purchase'
)
SELECT purchase_id, user_id, purchase_us, click_id, click_us,
       purchase_us - click_us AS gap_us,
       (click_id IS NULL) AS organic
FROM pj WHERE rn = 1
"""


@register("stream_attribution_outer_replay", oracle=ATTRIBUTION_OUTER_ORACLE)
def stream_attribution_outer_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEFT-OUTER form of stream_attribution_replay: purchases with
    no qualifying click survive as organic (NULL click side) — in
    streaming this is the subtle case (Spark emits the NULL-side row
    only once the watermark passes the join horizon; in batch and in
    the oracle the same rows fall out of the left join directly). The
    per-purchase window orders with explicit NULLS LAST on both
    engines so the organic rows rank deterministically."""
    from pyspark.sql import Window

    from ..streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.timestamp_micros(ns_micros("ts")).alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.timestamp_micros(ns_micros("ts")).alias("c_ts"),
    )
    j = interval_join(
        purchases, clicks, key="user_id",
        left_ts="p_ts", right_ts="c_ts",
        lower="1 HOUR", upper="0 SECONDS",
        how="left_outer",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc_nulls_last(), F.col("click_id").desc_nulls_last()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("p_ts").alias("purchase_us"),
            "click_id",
            F.unix_micros("c_ts").alias("click_us"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
            F.col("click_id").isNull().alias("organic"),
        )
    )


# -- day-partitioned layout + planning-time pruning ------------------------

PRUNE_DAY = 19725  # 2024-01-03 as an epoch-day index; inside every SF's span

DAYPART_ORACLE = f"""
WITH pe AS (
  SELECT event_id, epoch_us(ts) AS tsm, event_type, value FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_fp2,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM pe WHERE tsm // 86400000000 = {PRUNE_DAY}
GROUP BY 1
"""


@register("source_partitioned_prune", oracle=DAYPART_ORACLE)
def source_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One day's per-type event rollup read from the DAY-PARTITIONED
    events mirror (sources/bucketed.ensure_day_partitioned_events):
    the ``day_idx = {d}`` predicate is a planning-time PartitionFilter
    — the scan lists one directory out of ~30 and never opens the rest
    (plan-asserted in tests/test_plans.py). The oracle computes the
    same day slice from the RAW table, so the partitioned rewrite is
    proven value-lossless, not just faster. At 100 TB this layout is
    the first lever for any time-bounded query: day directories bound
    the bytes before a single row is read.""".format(d=PRUNE_DAY)
    from ..sources.bucketed import ensure_day_partitioned_events

    path = ensure_day_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path).filter(F.col("day_idx") == PRUNE_DAY)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr("CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(28,0))"))
        .cast("long")
        .alias("sum_value_fp2"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )
