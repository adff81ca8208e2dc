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
