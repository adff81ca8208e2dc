"""Bucketed (pre-partitioned, pre-sorted) table layout for co-located
joins.

Bucketing is THE storage-side answer to "this fact⋈fact join shuffles
100 TB every night": write both sides hash-clustered (and sorted) on
the join key once, and every subsequent equi-join on that key reads
both sides already distributed — Catalyst sees the bucket spec as a
satisfied `HashPartitioning` requirement and plans the join with NO
Exchange on either side (and, with ``sortBy``, no Sort either). The
one-time write cost amortizes across every downstream join/aggregation
on the same key.

This module manages bucketed mirrors of the testdata tables under the
repo-local scratch warehouse. Tables are Spark EXTERNAL tables
(explicit ``path``) so the files outlive any one session; a fresh
session that lost its in-memory catalog re-registers the same files.

At cluster scale the same call writes to the shared metastore/object
store; the bucket count becomes a capacity decision (buckets ≈ cluster
cores × small-k, each bucket file ≲ a few hundred MB).

The reference has no storage layer at all (it materializes into OLTP
SQL tables, src/db/mod.rs) — this is Spark-native extension surface
for the repeated-join workloads the engine's relational queries model.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "bucketed",
)


def bucketed_name(sf_dir: str, table: str, keys: tuple[str, ...], n_buckets: int) -> str:
    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}:{','.join(keys)}:{n_buckets}".encode())
    return f"b_{table}_{tag.hexdigest()[:10]}"


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int = 8,
    sort: bool = True,
) -> DataFrame:
    """Return the bucketed mirror of ``table``, creating it on first
    use. Idempotent per (sf_dir, keys, n_buckets); the name encodes the
    spec so changing either writes a fresh mirror instead of silently
    reading a stale layout."""
    name = bucketed_name(sf_dir, table, tuple(keys), n_buckets)
    if not spark.catalog.tableExists(name):
        path = os.path.join(_WAREHOUSE, name)
        w = load_table(spark, sf_dir, table).write.bucketBy(n_buckets, *keys)
        if sort:
            w = w.sortBy(*keys)
        w.mode("overwrite").option("path", path).format("parquet").saveAsTable(name)
    return spark.table(name)
