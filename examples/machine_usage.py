"""machine-usage: start/stop interval pairing, materialized live.

Mirrors /root/reference/examples/machine-usage (logic.rs:28-54: per
machine, Started{order} opens, a matching Stopped emits (machine,
order, started, duration); re-starts overwrite). Transposition
(plans/reference.py e2_usage_intervals): 'signup' = start, 'purchase'
= stop, order id = floor(value) % 10.
Run: python examples/machine_usage.py [sf_dir] [db]"""

from __future__ import annotations

import sys

from _runner import DEFAULT_SF, run_two_epochs

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from actyxos_data_flow_spark.functions.scalar import ns_micros
from actyxos_data_flow_spark.sinks import DbColumn, DbTable

TABLE = DbTable(
    name="machine_usage",
    columns=(
        DbColumn("user_id", "bigint", index=True),
        DbColumn("order_id", "bigint"),
        DbColumn("started_micros", "bigint"),
        DbColumn("duration_micros", "bigint"),
    ),
    version=1,
)


def build_view(events):
    tagged = events.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        (F.floor("value").cast("long") % 10).alias("order_id"),
        F.when(F.col("event_type") == "signup", "start").otherwise("stop").alias("kind"),
        ns_micros("ts").alias("ts_micros"),
        "event_id",
    )
    w = W.partitionBy("user_id", "order_id").orderBy("event_id")
    paired = tagged.select(
        "user_id",
        "order_id",
        "kind",
        "ts_micros",
        F.lag("kind").over(w).alias("prev_kind"),
        F.lag("ts_micros").over(w).alias("prev_ts"),
    )
    return paired.filter((F.col("kind") == "stop") & (F.col("prev_kind") == "start")).select(
        "user_id",
        "order_id",
        F.col("prev_ts").alias("started_micros"),
        (F.col("ts_micros") - F.col("prev_ts")).alias("duration_micros"),
    )


if __name__ == "__main__":
    run_two_epochs(
        TABLE,
        build_view,
        sf_dir=sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF,
        db_path=sys.argv[2] if len(sys.argv) > 2 else None,
    )
