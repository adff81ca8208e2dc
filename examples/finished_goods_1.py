"""finished-goods-1: per-(article, workstation) production totals.

Mirrors /root/reference/examples/finished-goods-1 (logic.rs:27-50:
group_by((article_id, workstation)) → sum(count × pcs) + first
article_name). Transposition (plans/reference.py
e3_production_summary): lineitem plays the production log —
l_partkey = article, l_suppkey = workstation, l_quantity = pcs,
part.p_name = article_name (broadcast dimension join). The epoch
split keys on l_orderkey (the log's arrival order stand-in).
Run: python examples/finished_goods_1.py [sf_dir] [db]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _runner import DEFAULT_SF  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from actyxos_data_flow_spark.flow import Flow  # noqa: E402
from actyxos_data_flow_spark.session import get_spark  # noqa: E402
from actyxos_data_flow_spark.sinks import (  # noqa: E402
    DbColumn,
    DbTable,
    SnapshotMirror,
    SqliteSink,
    write_snapshot,
)
from actyxos_data_flow_spark.sources import load_table  # noqa: E402

TABLE = DbTable(
    name="production_summary",
    columns=(
        DbColumn("article_id", "bigint", index=True),
        DbColumn("workstation", "bigint", index=True),
        DbColumn("article_name", "text"),
        DbColumn("total_pcs", "double precision"),
    ),
    version=1,
)


def build_view(lineitem, part):
    flow = (
        Flow.source(lineitem)
        .group_by("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_pcs"))
    )
    return flow.df.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "inner"
    ).select(
        F.col("l_partkey").alias("article_id"),
        F.col("l_suppkey").alias("workstation"),
        F.col("p_name").alias("article_name"),
        "total_pcs",
    )


def main(sf_dir=DEFAULT_SF, db_path=None, spark=None):
    own = spark is None
    if spark is None:
        spark = get_spark("examples")
    if db_path is None:
        db_path = os.path.join(".scratch", "examples", f"{TABLE.name}.sqlite")
        os.makedirs(os.path.dirname(db_path), exist_ok=True)
        if os.path.exists(db_path):
            os.remove(db_path)
    sink = SqliteSink(db_path)
    sink.ensure(TABLE)
    mirror = SnapshotMirror(spark, db_path + ".mirror")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    hi = int(lineitem.agg(F.max("l_orderkey")).first()[0])
    cut = int(hi * 0.8)
    stats = []
    for label, upto in (("catch-up", cut), ("live", hi)):
        view = build_view(lineitem.filter(F.col("l_orderkey") <= upto), part)
        applied = write_snapshot(spark, sink, TABLE, view, {"lineitem": upto}, mirror)
        stats.append(
            {
                "epoch": label,
                "offset": upto,
                "delta_rows_applied": applied,
                "table_rows": len(sink.rows(TABLE)),
                "offsets": sink.read_offsets(TABLE),
            }
        )
    if own:
        for s in stats:
            print(s)
        print(f"first rows of {TABLE.name}: {sink.rows(TABLE)[:5]}")
    return sink, stats


if __name__ == "__main__":
    main(
        sf_dir=sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF,
        db_path=sys.argv[2] if len(sys.argv) > 2 else None,
    )
