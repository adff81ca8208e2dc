#!/usr/bin/env python
"""Diff the LIVE engine fingerprint against a committed env-probe
artifact — the 2-minute diagnosis for any local-green/driver-red hash
split.

Runs the registered ``env_probe`` query in THIS environment (Spark JVM
libm + in-process DuckDB) and compares every sentinel against the
reference JSON (default: ENV_PROBE_r10.json, the builder's committed
values — identical to r09's, so the committed fingerprint constants in
plans/envprobe.py cover both). A differing ``*.pow_*``/``*.exp_*``/``*.ln_*`` row means the
two environments' libm builds disagree at that primitive — any hashed
column whose lineage passes through it is suspect; ``round_half_6dp``
diverging means the round(double, k) class; ``cast_dec_half`` the
double→decimal rounding class. Version rows differing tells you WHY.

Usage: python tools/env_diff.py [reference.json]
Exit 0 = fingerprints identical; 1 = drift found (rows printed).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ref_path = sys.argv[1] if len(sys.argv) > 1 else "ENV_PROBE_r10.json"
    with open(ref_path) as fh:
        ref = json.load(fh)

    from actyxos_data_flow_spark.plans import load_all
    from actyxos_data_flow_spark.session import get_spark

    spark = get_spark("env_diff")
    live = {
        r["component"]: r["value"]
        for r in load_all()["env_probe"].fn(spark, "/root/testdata/sf0.001").collect()
    }

    drift = []
    for k in sorted(set(ref) | set(live)):
        a, b = ref.get(k), live.get(k)
        if a != b:
            drift.append((k, a, b))
    if not drift:
        print(f"fingerprint identical to {ref_path} ({len(live)} rows)")
        return 0
    print(f"{len(drift)} fingerprint rows differ from {ref_path}:")
    for k, a, b in drift:
        print(f"  {k}:\n    ref : {a}\n    live: {b}")
    print(
        "\nany hashed column whose lineage passes through a drifted primitive "
        "is suspect; platform/version rows explain the build difference."
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
