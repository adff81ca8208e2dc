"""Fresh-JVM cold timing for a SUBSET of registry queries (round 12).

Mirrors bench.run_cold_sweep exactly — one untimed JIT pass, then min
of 3 cache-cleared passes to the noop sink — but for the named queries
only, so an optimization A/B comparison costs seconds, not the full
sweep. Run it as its own process per variant (fresh JVM both sides).

Usage: python tools/coldq.py SF_DIR QUERY [QUERY...] [--passes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from actyxos_data_flow_spark.plans import load_all  # noqa: E402
from actyxos_data_flow_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("coldq")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in args.queries:
        warm: dict[str, float] = {}
        bench._timed(registry, spark, name, args.sf_dir, warm, errors)  # JIT pass
        if name in errors:
            continue
        for _ in range(args.passes):
            bench._clear_spark_caches(spark)
            t1: dict[str, float] = {}
            bench._timed(registry, spark, name, args.sf_dir, t1, errors)
            if name in t1:
                cold[name] = min(cold.get(name, t1[name]), t1[name])
    print(json.dumps({"queries_cold": {k: round(v, 3) for k, v in cold.items()}, "errors": errors}))


if __name__ == "__main__":
    main()
