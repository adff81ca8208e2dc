"""Per-query optimization profiler (round 12).

For each named registry query: build the DataFrame (eager driver
actions — collect/count/localCheckpoint — run HERE and are timed
separately), execute it to the noop sink (guide §1.4), and report

    build_sec   driver-side plan construction incl. eager actions
    exec_sec    the noop-sink execution
    n_jobs      Spark jobs launched end-to-end (job-group tracked)
    plan        Exchange / WholeStageCodegen / BatchEvalPython /
                ArrowEvalPython / SortMergeJoin / BroadcastHashJoin /
                ShuffledHashJoin node counts in the executed plan

With --explain DIR, writes the formatted plan to DIR/<query>_<tag>.txt
(the round's before/after evidence files). Caches are cleared between
queries exactly like bench.py's cold passes.

Usage:
    python tools/profile_query.py SF_DIR QUERY [QUERY...] [--explain DIR]
        [--tag before|after] [--passes N]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from actyxos_data_flow_spark.plans import load_all  # noqa: E402
from actyxos_data_flow_spark.session import get_spark  # noqa: E402

PLAN_NODES = (
    "Exchange",
    "WholeStageCodegen",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Sort ",
    "AQEShuffleRead",
    "TakeOrderedAndProject",
    "InMemoryTableScan",
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_counts(text: str) -> dict:
    return {n.strip(): len(re.findall(re.escape(n), text)) for n in PLAN_NODES}


def clear(spark) -> None:
    # mirror bench._clear_spark_caches (incl. every checkpoint memo)
    import bench as _b

    _b._clear_spark_caches(spark)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain", default=None, help="dir for formatted-plan dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("profile")
    sc = spark.sparkContext
    registry = load_all()
    sc.range(1000).sum()  # session warm-up

    for name in args.queries:
        spec = registry[name]
        results = []
        plan_txt = ""
        for p in range(args.passes + 1):  # pass 0 = untimed JIT pass
            clear(spark)
            group = f"{name}-p{p}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} build")
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name} exec")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if p > 0:
                results.append((t1 - t0, t2 - t1, n_jobs))
            else:
                plan_txt = formatted_plan(df)
            sc.setJobDescription(None)
        build = min(r[0] for r in results)
        execs = min(r[1] for r in results)
        total = min(r[0] + r[1] for r in results)
        jobs = results[-1][2]
        counts = {k: v for k, v in plan_counts(plan_txt).items() if v}
        print(
            f"{name}: total={total:.3f}s build={build:.3f}s exec={execs:.3f}s "
            f"jobs={jobs} plan={counts}",
            flush=True,
        )
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            out = os.path.join(args.explain, f"{name}_{args.tag}.txt")
            with open(out, "w") as f:
                f.write(plan_txt)


if __name__ == "__main__":
    main()
