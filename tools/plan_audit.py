"""Physical-plan audit over the whole query registry.

For every ``queries()`` entry, builds the DataFrame, pulls the executed
plan (`explain("formatted")` text) and mechanically extracts the
plan-shape facts the scale review cares about:

- shuffle exchange count (the dominant cluster cost)
- broadcast exchange count (small-dim joins done right)
- sort count (SortMergeJoin / window sorts)
- cartesian / broadcast-nested-loop joins (almost always a bug at scale;
  the brute-force ANN kernels are the documented exceptions)
- whole-stage-codegen span count vs total operators (JVM-side fraction)
- Python evaluation nodes (Arrow-batched mapInPandas etc. — the slow
  path, must be deliberate)
- parquet scans with non-empty PushedFilters, and column-pruned scans

Usage::

    python tools/plan_audit.py [sf_dir] [query ...]   # default sf0.01

Emits one JSON object keyed by query, plus a markdown table on stdout
(``--md``) for the per-round PLANS artifact. This is the mechanized
"would this survive 100x" reviewer: regressions show up as a diff in
the committed artifact, not as a reviewer's memory.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_facts(df) -> dict:
    """Extract plan-shape counters from a DataFrame's physical plan.

    Join strategies are whatever Catalyst picks at the audited SF (AQE
    initial plan) — at sf0.01 small sides broadcast that would
    sort-merge at sf10; the audit's point is the INVARIANTS (no
    cartesian outside the brute-force kernels, filters pushed, Python
    only where deliberate), not the strategy picks."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
    txt = qe.explainString(mode("formatted"))
    # the tree section (up to the first per-node detail block) names
    # each physical operator exactly once, including reuse markers
    tree = txt.split("\n\n(")[0]
    simple = qe.executedPlan().toString()  # "*(n)" = whole-stage-codegen span n
    return {
        "shuffles": len(re.findall(r"\bExchange \(", tree)),
        "broadcasts": tree.count("BroadcastExchange"),
        "reused_exchanges": tree.count("ReusedExchange"),
        "sorts": len(re.findall(r"\bSort \(", tree)),
        "cartesian": tree.count("CartesianProduct"),
        # BNLJ against a 1-row side is the correct physical shape for
        # scalar-subquery joins (q11 threshold, q22 avg, mix-weight
        # totals) — listed separately so true cartesians stand out
        "bnlj": tree.count("BroadcastNestedLoopJoin"),
        # only annotated pre-execution for non-AQE plans (AQE hides
        # codegen decisions until runtime); 0 under AQE means "unknown"
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "python_nodes": sum(
            tree.count(n)
            for n in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "FlatMapGroupsWithStateExec",
            )
        ),
        "scans": tree.count("Scan parquet"),
        "pushed_filter_scans": len(
            [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", txt) if m.strip()]
        ),
        "aqe": "AdaptiveSparkPlan" in tree,
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_md = "--md" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from actyxos_data_flow_spark.plans import load_all
    from actyxos_data_flow_spark.session import get_spark

    regs = load_all()
    spark = get_spark()
    out: dict[str, dict] = {}
    for name, reg in regs.items():
        if only and name not in only:
            continue
        try:
            out[name] = plan_facts(reg.fn(spark, sf_dir))
        except Exception as ex:  # audit must not die on one query
            out[name] = {"err": f"{type(ex).__name__}: {ex}"[:200]}

    if want_md:
        cols = (
            "shuffles broadcasts sorts cartesian bnlj codegen_spans "
            "python_nodes scans pushed_filter_scans"
        ).split()
        print("| query | " + " | ".join(cols) + " |")
        print("|---" * (len(cols) + 1) + "|")
        for name in sorted(out):
            f = out[name]
            if "err" in f:
                print(f"| {name} | ERR: {f['err']} |")
            else:
                print("| " + name + " | " + " | ".join(str(f[c]) for c in cols) + " |")
    else:
        print(json.dumps(out, indent=1, sort_keys=True))

    flagged = sorted(
        n
        for n, f in out.items()
        if "err" not in f
        and f["cartesian"]
        and not n.startswith(("ann_cosine", "ann_recall", "ann_hard"))
    )
    if flagged:
        print(f"## cartesian outside the brute-force kernels: {flagged}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
