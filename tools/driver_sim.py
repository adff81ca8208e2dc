"""Replica of the driver's graded run: a VANILLA SparkSession (none of
session.get_spark's confs — the engine must self-apply whatever it
needs) driving the ``_PRIORITY`` prefix through the same oracle compare
as tools/check.py. This is the closest local predictor of the driver's
CORRECTNESS_r{N}.json: same entry surface (__spark_entry__), same
grading order, same value-hash.

Usage::

    python tools/driver_sim.py [sf_dir] [n_prefix]   # defaults sf0.01, all of _PRIORITY
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from check import env_stamp, value_hash  # noqa: E402  (tools/ sibling)


def _is_int(s: str) -> bool:
    """True for anything int() accepts (including '-5'), so signed
    prefixes route to the n_prefix branch and its error message."""
    try:
        int(s)
        return True
    except ValueError:
        return False


def main() -> int:
    # explicit positional parse: argv[1] is sf_dir iff it LOOKS like a
    # path (contains a separator, exists as a directory, or is not a
    # plain unsigned integer) — a mistyped path must error out, not
    # silently fall back to the default dataset and then crash in int()
    # with an unrelated ValueError. The isdir() check first means a
    # relative dataset directory named with digits only ('3/') still
    # parses as sf_dir, and a negative n_prefix like '-5' reaches the
    # int() branch with ITS error message instead of a bogus
    # missing-directory complaint (ADVICE r10).
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:  # atomic artifact write (round-11 truncation fix)
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.01"
    if args and (os.sep in args[0] or os.path.isdir(args[0]) or not _is_int(args[0])):
        sf_dir = args.pop(0)
        if not os.path.isdir(sf_dir):
            print(f"driver_sim: sf_dir does not exist: {sf_dir}", file=sys.stderr)
            return 2
    if len(args) > 1:
        print(f"driver_sim: unexpected arguments: {args[1:]}", file=sys.stderr)
        return 2
    try:
        n_prefix = int(args[0]) if args else None
    except ValueError:
        print(f"driver_sim: n_prefix must be an integer, got {args[0]!r}", file=sys.stderr)
        return 2
    if n_prefix is not None and n_prefix <= 0:
        print(f"driver_sim: n_prefix must be positive, got {n_prefix}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E
    from actyxos_data_flow_spark.plans import _PRIORITY
    from actyxos_data_flow_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        tp = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(tp):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tp}/*.parquet')")
        elif os.path.exists(tp):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tp}')")

    queries, oracles = E.queries(), E.oracle_sql()
    names = list(_PRIORITY[:n_prefix] if n_prefix else _PRIORITY)
    results, failed = {}, []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                results[name] = {"status": "rows_only", "rows": len(srows), "sec": round(time.time() - t0, 2)}
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ok = (
                len(srows) == len(orows)
                and sorted(scols) == sorted(ocols)
                and value_hash(srows, scols) == value_hash(orows, ocols)
            )
            results[name] = {
                "status": "MATCH" if ok else "MISMATCH",
                "rows": len(srows),
                "oracle_rows": len(orows),
                "count_ok": len(srows) == len(orows),
                "schema_ok": sorted(scols) == sorted(ocols),
                "hash_ok": ok,
                "sec": round(time.time() - t0, 2),
            }
            if not ok:
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            results[name] = {"status": "ERROR", "error": str(e)[:500], "sec": round(time.time() - t0, 2)}
    results["_note"] = (
        f"vanilla-SparkSession replica of the driver's graded prefix "
        f"({len(names)} rows) at {sf_dir} — none of session.get_spark's confs"
    )
    results["_env"] = env_stamp()
    if out_path:
        from artifacts import atomic_write_json

        atomic_write_json(out_path, results)
    print(json.dumps(results, indent=2, default=str))
    n_ok = sum(1 for k, r in results.items() if not k.startswith("_") and r["status"] in ("MATCH", "rows_only"))
    print(f"\n{n_ok}/{len(names)} ok; failed: {failed}", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
