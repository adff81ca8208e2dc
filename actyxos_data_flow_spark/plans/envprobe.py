"""env_probe — a rows-only diagnostic row that makes every driver run
carry its own engine fingerprint.

Rounds 7 and 8 each burned a full round-trip on local-green /
driver-red hash splits that turned out to be engine-build (libm /
decimal) differences invisible from the artifacts. This query has NO
oracle by design (the driver records only a rows/schema check, never a
hash), and its OUTPUT ROWS are the diagnosis: both engines' versions
plus sentinel libm/round/cast evaluations at fixed arguments, rendered
to 17 significant digits — one glance at the collected rows in any
environment shows exactly which primitive diverges from the builder's
committed values.

Spark sentinels run through Spark SQL (the JVM's java.lang.Math — the
same code path every hashed query's doubles take), DuckDB sentinels
through an in-process duckdb connection (the same library tools/check
and the driver's oracle gate use). The row count is FIXED regardless
of environment (missing duckdb yields 'unavailable' values, never
missing rows), so the rows-only check is stable.
"""

from __future__ import annotations

import platform
import sys

from pyspark.sql import DataFrame, SparkSession

from . import register

# (name, SQL expression) — identical text evaluated by BOTH engines;
# every expression is one of the primitives whose build-dependence has
# bitten a past round: libm pow/exp/ln, round(double, k) at a
# half-boundary, and double→DECIMAL cast rounding.
_SENTINELS: tuple[tuple[str, str], ...] = (
    # every argument is CAST AS DOUBLE: Spark types bare x.y literals
    # (and their quotients) as DECIMAL, which would probe decimal
    # division instead of the libm primitive
    ("pow_20_613_0p3", "printf('%.17e', pow(CAST(20 AS DOUBLE)/613, CAST(0.3 AS DOUBLE)))"),
    ("exp_m9p848", "printf('%.17e', exp(CAST(-9.848 AS DOUBLE)))"),
    ("ln_7_613", "printf('%.17e', ln(CAST(7 AS DOUBLE)/613))"),
    ("sqrt_2", "printf('%.17e', sqrt(CAST(2 AS DOUBLE)))"),
    ("round_half_6dp", "printf('%.17e', round(CAST(0.5000005 AS DOUBLE), 6))"),
    ("round_2p5", "printf('%.17e', round(CAST(2.5 AS DOUBLE)))"),
    ("cast_dec_half", "CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(12,2))"),
)


def _spark_sentinels(spark: SparkSession) -> list[tuple[str, str]]:
    exprs = ", ".join(
        f"CAST({sql} AS STRING) AS {name}" for name, sql in _SENTINELS
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    return [(f"spark.{name}", str(row[name])) for name, _ in _SENTINELS]


def _duckdb_sentinels() -> list[tuple[str, str]]:
    try:
        import duckdb

        con = duckdb.connect()
        out = [("duckdb.version", duckdb.__version__)]
        for name, sql in _SENTINELS:
            out.append(
                (f"duckdb.{name}", str(con.execute(f"SELECT CAST({sql} AS VARCHAR)").fetchone()[0]))
            )
        con.close()
        return out
    except Exception:  # duckdb absent/broken: fixed row count, flagged values
        return [("duckdb.version", "unavailable")] + [
            (f"duckdb.{name}", "unavailable") for name, _ in _SENTINELS
        ]


@register("env_probe", oracle=None)
def env_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine fingerprint as data rows (component, value) — versions +
    17-sig-digit sentinel libm/round/cast values from BOTH engines.
    Rows-only (no oracle, no hash gate): the values are MEANT to vary
    across environments; varying is the diagnosis, not a failure."""
    rows: list[tuple[str, str]] = [
        ("spark.version", spark.version),
        ("python.version", sys.version.split()[0]),
        ("java.version", _java_version(spark)),
        ("platform", platform.platform()),
    ]
    rows += _spark_sentinels(spark)
    rows += _duckdb_sentinels()
    return spark.createDataFrame(rows, "component string, value string")


def _java_version(spark: SparkSession) -> str:
    try:
        return str(spark._jvm.java.lang.System.getProperty("java.version"))
    except Exception:
        return "unknown"


# -- row-count-encoded fingerprints (round 10) ------------------------------
#
# env_probe's VALUES never reach the builder: the driver artifact carries
# only {rows, schema, hash} booleans and row COUNTS per query.  These two
# probes therefore encode sentinel agreement in the ROW COUNT itself:
# each returns exactly  mask = Σ 2^i over sentinels i that match the
# committed builder constants  rows (the integers 1..mask), so the
# `spark_rows` / `oracle_rows` integers in the driver's own artifact
# identify PRECISELY which libm/round/cast primitive diverges in the
# driver build — bit i of the count is sentinel i.  Healthy env = 127.
#
# Committed constants = the round-9 builder values (ENV_PROBE_r09.json):
# Spark 4.1.2 / OpenJDK 17.0.20 java.lang.Math, DuckDB 1.0.0.

BUILDER_SPARK_SENTINELS: dict[str, str] = {
    "pow_20_613_0p3": "3.58154866291250500e-01",
    "exp_m9p848": "5.28527929662956140e-05",
    "ln_7_613": "-4.47245478688089800e+00",
    "sqrt_2": "1.41421356237309510e+00",
    "round_half_6dp": "5.00001000000000000e-01",
    "round_2p5": "3.00000000000000000e+00",
    "cast_dec_half": "0.13",
}

BUILDER_DUCKDB_SENTINELS: dict[str, str] = {
    "pow_20_613_0p3": "3.58154866291250484e-01",
    "exp_m9p848": "5.28527929662956213e-05",
    "ln_7_613": "-4.47245478688089815e+00",
    "sqrt_2": "1.41421356237309515e+00",
    "round_half_6dp": "5.00000000000000000e-01",
    "round_2p5": "3.00000000000000000e+00",
    "cast_dec_half": "0.13",
}


def _mask_frame(spark: SparkSession, mask: int) -> DataFrame:
    from pyspark.sql import functions as F

    return spark.range(1, mask + 1).select(F.col("id").cast("long").alias("seq"))


@register("env_fingerprint_spark", oracle=None)
def env_fingerprint_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-engine fingerprint as a ROW COUNT: returns the integers
    1..mask where bit i of mask is set iff Spark sentinel i evaluates
    to the committed round-9 builder constant. Rows-only by design
    (DuckDB cannot evaluate the JVM's libm); the driver artifact's
    `spark_rows` IS the diagnosis — 127 means the driver JVM computes
    every sentinel bit-identically to the builder; any other value
    names the diverging primitive by bit position (order:
    pow, exp, ln, sqrt, round6dp, round2.5, cast-decimal)."""
    got = dict(_spark_sentinels(spark))
    mask = 0
    for i, (name, _) in enumerate(_SENTINELS):
        if got.get(f"spark.{name}") == BUILDER_SPARK_SENTINELS[name]:
            mask |= 1 << i
    return _mask_frame(spark, mask)


_DUCK_MASK_SQL = "WITH m AS (SELECT " + " + ".join(
    f"(CASE WHEN CAST({sql} AS VARCHAR) = '{{{name}}}' THEN {1 << i} ELSE 0 END)"
    for i, (name, sql) in enumerate(_SENTINELS)
) + (
    # range bound derived from the sentinel count (ADVICE r10): a
    # hardcoded 128 would silently cap the oracle when an 8th sentinel
    # lands while _mask_frame emits up to 255 — a spurious mismatch in
    # the very diagnostic meant to explain mismatches
    f" AS mask) SELECT CAST(g.range + 1 AS BIGINT) AS seq"
    f" FROM m, range(0, {1 << len(_SENTINELS)}) g WHERE g.range < m.mask"
)

DUCKDB_FINGERPRINT_ORACLE = _DUCK_MASK_SQL.format(**BUILDER_DUCKDB_SENTINELS)


@register("env_fingerprint_duckdb", oracle=DUCKDB_FINGERPRINT_ORACLE)
def env_fingerprint_duckdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB-engine fingerprint as a ROW COUNT, fully hash-gated: the
    Spark side evaluates the sentinels through an IN-PROCESS duckdb
    connection (the same library the driver's oracle gate links), the
    oracle evaluates the identical expressions driver-side; both emit
    1..mask against the committed round-9 builder constants. Healthy
    driver = 127/127 MATCH; a diverging DuckDB build still MATCHES
    (both sides see the same library) but the count names the changed
    sentinel — and `oracle_rows` survives even if the in-process
    import path ever differs (mask −1 = import failure, 0 rows)."""
    try:
        import duckdb

        con = duckdb.connect()
        mask = 0
        for i, (name, sql) in enumerate(_SENTINELS):
            val = str(con.execute(f"SELECT CAST({sql} AS VARCHAR)").fetchone()[0])
            if val == BUILDER_DUCKDB_SENTINELS[name]:
                mask |= 1 << i
        con.close()
    except Exception:
        mask = 0
    return _mask_frame(spark, mask)
