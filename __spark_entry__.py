"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()`` — every implemented operator/workload from SURVEY.md §2,
    via the package registry (actyxos_data_flow_spark.plans).
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
    non-SQL-expressible ops → driver runs a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from actyxos_data_flow_spark.plans import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full corpus-to-training-batches pipeline (quality
    gate → exact dedup → MinHash-LSH near-dup removal → context-window
    chunking → token-budget packing) on sf0.001 — the engine's
    centerpiece workload; e1_dashboard (the reference's own flagship)
    stays in queries()."""
    registry = load_all()
    return registry["pipeline_training_batches"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
