"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry via Spark and its ``oracle_sql()`` via
DuckDB on the same parquet tables, comparing row count, column names and
an order-insensitive value hash. Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    """Order-insensitive: sort columns by name, then sort row tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    # --out FILE: write the JSON artifact atomically (temp+rename) in
    # addition to stdout. Shell `> FILE` redirection truncates at
    # process start and shipped a 0-byte artifact in round 11 — prefer
    # --out for anything that gets committed.
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = set(a for a in argv if not os.path.isdir(a))

    from actyxos_data_flow_spark.plans import load_all
    from actyxos_data_flow_spark.session import get_spark
    from actyxos_data_flow_spark.sources import TABLES

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        # probe corpora (.scratch/sf1bench) carry only the tables their
        # queries touch — register what exists; a query needing a
        # missing view errors visibly in its own row
        tp = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(tp):  # Spark-written probe tables are part-file dirs
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tp}/*.parquet')"
            )
        elif os.path.exists(tp):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tp}')")

    registry = load_all()
    results = {}
    failed = []
    for name, spec in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            t1 = time.time()  # engine-vs-oracle split (round-9 finding:
            # a single `sec` conflated a 2s engine with a 29-min oracle)
            if spec.oracle is None:
                results[name] = {"status": "rows_only", "rows": len(srows), "sec": round(t1 - t0, 2)}
                continue
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()  # same cursor: the oracle runs ONCE
            t2 = time.time()
            count_ok = len(srows) == len(orows)
            schema_ok = sorted(scols) == sorted(ocols)
            hash_ok = schema_ok and value_hash(srows, scols) == value_hash(orows, ocols)
            status = "MATCH" if (count_ok and schema_ok and hash_ok) else "MISMATCH"
            results[name] = {
                "status": status,
                "rows": len(srows),
                "oracle_rows": len(orows),
                "count_ok": count_ok,
                "schema_ok": schema_ok,
                "hash_ok": hash_ok,
                "sec": round(time.time() - t0, 2),
                "spark_sec": round(t1 - t0, 2),
                "oracle_sec": round(t2 - t1, 2),
            }
            if status != "MATCH":
                failed.append(name)
                if not schema_ok:
                    results[name]["spark_cols"] = scols
                    results[name]["oracle_cols"] = ocols
                if count_ok and schema_ok and not hash_ok:
                    # show a few value diffs to debug
                    order = sorted(range(len(scols)), key=lambda i: scols[i])
                    sset = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in srows)
                    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                    oset = sorted("\x1f".join(_norm_cell(r[i]) for i in oorder) for r in orows)
                    diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                    results[name]["sample_diffs"] = diffs
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            results[name] = {"status": "ERROR", "error": str(e)[:500], "sec": round(time.time() - t0, 2)}

    # Stamp the numeric environment the hashes were produced under —
    # round 7 proved a hash can be engine-BUILD-sensitive (libm/round
    # splits), so every committed artifact must self-describe the
    # engines that produced it, making the next cross-env split
    # diagnosable in minutes instead of a round.
    results["_env"] = env_stamp()
    if out_path:
        from artifacts import atomic_write_json

        atomic_write_json(out_path, results)
    print(json.dumps(results, indent=2, default=str))
    n_q = len(results) - 1
    n_match = sum(
        1
        for k, r in results.items()
        if k != "_env" and r["status"] in ("MATCH", "rows_only")
    )
    print(f"\n{n_match}/{n_q} ok; failed: {failed}", file=sys.stderr)
    sys.exit(1 if failed else 0)


def env_stamp() -> dict:
    """Versions of every engine whose numeric behavior the value hashes
    depend on (importable: ``from check import env_stamp``)."""
    import platform

    import pyspark

    jdk = os.environ.get("JAVA_HOME", "")
    try:
        import subprocess

        out = subprocess.run(
            [os.path.join(jdk, "bin", "java") if jdk else "java", "-version"],
            capture_output=True, text=True, timeout=10,
        )
        jver = (out.stderr or out.stdout).splitlines()[0].strip()
    except Exception:  # noqa: BLE001
        jver = "unknown"
    return {
        "duckdb": duckdb.__version__,
        "pyspark": pyspark.__version__,
        "python": platform.python_version(),
        "jdk": jver,
        "platform": platform.platform(),
    }


if __name__ == "__main__":
    main()
