"""Canonicalization-friendly literal frames.

``spark.createDataFrame(rows, schema)`` from Python produces a plan that
NEVER compares ``sameResult`` with an identically-built one (the local
data ships as an opaque serialized relation), so ANY plan built on top
of one is invisible to Spark's CacheManager logical-plan matching — a
repeated query re-computes every pinned intermediate downstream of the
little literal table. Measured on pipeline_mix_batches: warm passes
2.0-2.5s instead of ~0.4s, purely because the |domains|-row budget
table broke plan identity (round-10 finding #3; the round-8 number this
restores was CacheManager reuse working before the table existed).

A ``VALUES``-clause plan (inline table) canonicalizes structurally, so
two builds with the same data ARE sameResult and downstream cache
entries dedupe. This helper renders small driver-side model tables
(domain budgets, routing splits, DP winners — tens to thousands of
rows, never data-sized) as VALUES literals.
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import DataFrame, SparkSession


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"{v}L"  # BIGINT literal on any magnitude an int64 holds
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    # the remaining types a caller's row tuple can reasonably carry
    # (ADVICE r11: epoch_schedule routes the GROUP column through here,
    # and a date/decimal/float group key used to TypeError at runtime
    # where createDataFrame previously handled it)
    if isinstance(v, decimal.Decimal):
        return f"CAST('{v}' AS DECIMAL(38,{max(0, -v.as_tuple().exponent)}))"
    if isinstance(v, datetime.datetime):  # before date: datetime IS a date
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, float):
        # repr round-trips float64 exactly; the column CAST in
        # values_frame re-types it if the caller wants something else
        return f"CAST('{v!r}' AS DOUBLE)"
    raise TypeError(f"values_frame: unsupported literal type {type(v).__name__}")


def values_frame(
    spark: SparkSession,
    rows: list[tuple],
    names: list[str],
    types: list[str],
) -> DataFrame:
    """A small literal DataFrame via an inline VALUES table, cast
    column-by-column to ``types`` (Spark SQL type names). Identical
    (rows, names, types) build sameResult-equal plans — use this
    instead of createDataFrame for every model-sized table that feeds
    a cached/pinned subtree. Empty ``rows`` yields a typed empty frame
    (WHERE FALSE over one NULL tuple)."""
    cols = ", ".join(
        f"CAST(col{i + 1} AS {t}) AS `{n}`" for i, (n, t) in enumerate(zip(names, types))
    )
    if not rows:
        nulls = ", ".join("NULL" for _ in names)
        return spark.sql(f"SELECT {cols} FROM VALUES ({nulls}) WHERE FALSE")
    vals = ", ".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return spark.sql(f"SELECT {cols} FROM VALUES {vals}")
