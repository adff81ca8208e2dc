"""Test-data table loaders (batch sources).

The driver generates a deterministic TPC-H-ish star schema plus an
``events`` stream table, a ``documents`` corpus and an ``embeddings``
table at /root/testdata/sf{0.001,0.01,0.1} (see TESTDATA.md). These
loaders are the engine's batch source layer: plain parquet scans so
Catalyst gets predicate pushdown / column pruning for free.

The ``events`` table plays the role of the reference's ActyxOS event log
(envelope fields per SURVEY.md §1.2): ``event_id`` = lamport (total
order), ``user_id`` = stream/fish key, ``event_type`` = payload
discriminator, ``props`` = JSON payload, ``ts`` = wall-clock timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Canonical in-engine form of the events timestamp: epoch NANOSECONDS as
#: LONG. Every consumer converts via ``functions.scalar.ns_micros`` —
#: dtype normalization happens HERE, once, so a change in the upstream
#: writer's physical parquet type can never reach query code. The
#: reference gets this stability from its SDK envelope (the event
#: service owns the wire form; ``/root/reference/src/runner.rs:395-411``
#: compares micros, ``examples/machine-usage/model.rs:61`` does
#: ``as_i64()/1_000_000``); a raw-parquet engine must supply it itself.
_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ts_as_long_nanos(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to LONG epoch-nanos, whatever the
    parquet physical type resolved to:

    - ``LONG``          — INT64 TIMESTAMP(NANOS) read under
      ``nanosAsLong`` (the round-1 testdata form): already nanos.
    - ``TIMESTAMP_NTZ`` — physical ``timestamp[us/ms]`` with
      ``isAdjustedToUTC=false`` (the current testdata form). Converted
      with ``timestampdiff(MICROSECOND, epoch, ts)``, which is session-
      timezone-INDEPENDENT (NTZ-to-NTZ arithmetic) and matches DuckDB's
      ``epoch_us(ts)`` on the same file.
    - ``TIMESTAMP``     — ``isAdjustedToUTC=true`` (instant semantics):
      ``unix_micros`` is exact and timezone-independent by definition.

    Micros→nanos ``*1000`` stays exact in LONG until year 2262 — the
    same domain the nanos physical type itself can represent.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df
    if isinstance(dt, T.TimestampNTZType):
        micros = F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, `{col}`)")
    elif isinstance(dt, T.TimestampType):
        micros = F.unix_micros(F.col(col))
    else:
        raise TypeError(
            f"events.{col} resolved to unsupported type {dt}; expected "
            "LONG (nanos), TIMESTAMP or TIMESTAMP_NTZ"
        )
    return df.withColumn(col, (micros * F.lit(1000)).cast("long"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # If events.ts is physical INT64 TIMESTAMP(NANOS) (which Spark 4
        # rejects by default) this reads it as LONG nanos; a no-op for
        # micro/milli physical types. Set here (not only in session.py)
        # so the driver's own session gets it too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return _ts_as_long_nanos(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Scale-ADAPTIVE scan parallelization (r12, guide §2): repartition
    only when the frame's physical partition count is below the
    session's parallelism. The case this exists for: a row-local
    pipeline (e.g. the zero-Exchange shingle/signature stage) consuming
    a small, unsplittable parquet file — one single-row-group 584 KB
    local testdata file is ONE scan task, so without this the whole
    stage runs single-threaded. At corpus scale the scan already has
    >= cores splits and this is a NO-OP — it is never a tuned constant
    and never adds a shuffle on a real cluster.

    Only meant for scan-shaped frames (load_table output, optionally
    filtered/projected): ``df.rdd`` on a shuffle-bearing AQE plan could
    materialize query stages eagerly — keep it at the leaf."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: leave the frame alone
        return df
    return df.repartition(p) if n < p else df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    keys: tuple[str, ...] | list[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet
    table: rows are hash-partitioned into ``buckets`` files per
    partition by ``keys`` AT WRITE TIME, so every later join or
    aggregation on those keys reads co-located data and plans with NO
    exchange — the shuffle is paid once, at write, instead of per query.

    This is the 100 TB answer for fact-fact joins too big to broadcast
    and too hot to re-shuffle per query (e.g. lineitem x orders on
    orderkey): bucket both sides with the same key and count. Requires a
    table catalog (``saveAsTable``); plain ``.parquet(path)`` cannot
    record bucket metadata."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] | list[str],
    sort_cols: tuple[str, ...] | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as hive-partitioned parquet: one directory per
    ``partition_cols`` value, rows optionally sorted within files (run-
    length/dictionary friendly, and range metadata makes row-group skip
    effective). Any later filter on the partition columns prunes whole
    directories at PLANNING time — the scan never lists them — which is
    the first and cheapest lever at 100 TB: partition by what you filter
    by (date, source, language), sort by what you range-scan."""
    w = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    w.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_write(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    mode: str = "overwrite",
    exact: bool = False,
) -> None:
    """Small-files compaction: rewrite ``df`` as parquet with bounded,
    near-uniform file sizes. Streaming ingestion (micro-batch appends,
    per-partition task outputs) accretes thousands of small files whose
    open/footer costs eventually dominate scans — periodic compaction is
    the standard maintenance pass.

    Default path is declarative and shuffle-free: ``maxRecordsPerFile``
    caps file size at write and AQE coalescing merges tiny tasks —
    Catalyst plans it, no count() job. ``exact=True`` adds one count()
    and a round-robin ``repartition`` to hit the file-count target even
    for pathologically skewed inputs (costs a full shuffle — use for
    the periodic compactor, not the hot path)."""
    if exact:
        n = max(1, -(-df.count() // target_rows_per_file))
        df = df.repartition(n)
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )
