"""Benchmark harness: runs the headline queries (registry entries with
bench=True) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query executes to a noop sink (full plan runs, no driver
materialization cost). One JVM, queries timed after a small session
warm-up so per-query numbers reflect plan execution, not JVM start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from actyxos_data_flow_spark.plans import load_all
from actyxos_data_flow_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    registry = {k: v for k, v in load_all().items() if v.bench}
    # session warm-up (JVM/codegen): trivial job, not timed
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name, spec in registry.items():
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline query wall-clock (noop sink), sum over queries",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
