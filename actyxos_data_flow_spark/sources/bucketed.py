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


def bucketed_name(
    sf_dir: str, table: str, keys: tuple[str, ...], n_buckets: int, sort: bool = True
) -> str:
    # the source file's (mtime, size) is part of the identity: a
    # driver-side testdata regeneration must invalidate the mirror, not
    # silently serve stale rows. The SORT flag is part of it too — a
    # mirror written unsorted must never be adopted under SORTED BY
    # DDL (Catalyst would elide the Sort before a SortMergeJoin and
    # join wrong).
    src = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except FileNotFoundError:
        stamp = "nosrc"
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{','.join(keys)}:{n_buckets}:{int(sort)}:{stamp}".encode()
    )
    return f"b_{table}_{tag.hexdigest()[:10]}"


def _write_spec(path: str, keys: tuple[str, ...], n_buckets: int, sort: bool) -> None:
    """Sidecar recording HOW the mirror files were actually written
    (spec + per-file sizes). Adoption trusts this record, not the
    caller's arguments: the DDL re-declaration must describe the files
    as they are, and a mirror that lost/changed a bucket file after
    _SUCCESS (manual cleanup, partial disk loss) must be rewritten, not
    served with silently-missing buckets."""
    import json as _json

    files = {
        f: os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    with open(os.path.join(path, "_SPEC.json"), "w") as fh:
        _json.dump(
            {"keys": list(keys), "n_buckets": n_buckets, "sort": bool(sort), "files": files},
            fh,
        )


def _spec_matches(path: str, keys: tuple[str, ...], n_buckets: int, sort: bool) -> bool:
    import json as _json

    try:
        with open(os.path.join(path, "_SPEC.json")) as fh:
            spec = _json.load(fh)
    except (FileNotFoundError, ValueError):
        return False  # pre-sidecar mirror or corrupt record: rewrite
    if (
        spec.get("keys") != list(keys)
        or spec.get("n_buckets") != n_buckets
        or spec.get("sort") != bool(sort)
    ):
        return False
    recorded = spec.get("files", {})
    for f, size in recorded.items():
        fp = os.path.join(path, f)
        if not os.path.exists(fp) or os.path.getsize(fp) != size:
            return False  # a bucket file was lost/changed after _SUCCESS
    # set equality, not subset: a STRAY parquet that appeared after the
    # spec was written would be scanned by the adopted table and serve
    # duplicate/foreign rows — "describe the files as they are" cuts
    # both ways
    current = {f for f in os.listdir(path) if f.endswith(".parquet")}
    if current != set(recorded):
        return False
    return True


def _adopt_bucketed_files(
    spark: SparkSession,
    name: str,
    path: str,
    keys: tuple[str, ...],
    n_buckets: int,
    sort: bool,
) -> bool:
    """Register an already-written bucketed mirror in THIS session's
    catalog without rewriting it — the metastore role, emulated: a
    fresh session (the driver's vanilla SparkSession, the bench's
    --scale-only subprocess) loses the in-memory catalog but not the
    files, and re-shuffling a mirror whose whole point is 'pay the
    shuffle once' would forfeit the point session after session.
    Bucket identity is safe to adopt because it is VERIFIED, not
    assumed: ``saveAsTable(bucketBy)`` names every file with its bucket
    id suffix, the ``_SPEC.json`` sidecar records the written spec and
    per-file sizes, and adoption refuses (returns False → caller
    rewrites) when the sidecar is absent, describes a different
    (keys, n_buckets, sort), or any recorded file is missing/resized —
    ``_SUCCESS`` guards completeness of the WRITE, the sidecar guards
    against later file loss. The DDL below then re-declares the
    recorded CLUSTERED/SORTED spec, so Spark trusts (and test plans
    verify) the same ``Bucketed: true`` scans."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    if not _spec_matches(path, keys, n_buckets, sort):
        return False
    schema = spark.read.parquet(path).schema
    cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    key_ddl = ", ".join(f"`{k}`" for k in keys)
    sorted_ddl = f" SORTED BY ({key_ddl})" if sort else ""
    spark.sql(
        f"CREATE TABLE {name} ({cols_ddl}) USING parquet "
        f"CLUSTERED BY ({key_ddl}){sorted_ddl} INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return True


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
    reading a stale layout. A fresh session ADOPTS existing files via
    bucketed DDL instead of rewriting (see _adopt_bucketed_files)."""
    name = bucketed_name(sf_dir, table, tuple(keys), n_buckets, sort)
    if not spark.catalog.tableExists(name):
        path = os.path.join(_WAREHOUSE, name)
        if not _adopt_bucketed_files(spark, name, path, tuple(keys), n_buckets, sort):
            w = load_table(spark, sf_dir, table).write.bucketBy(n_buckets, *keys)
            if sort:
                w = w.sortBy(*keys)
            w.mode("overwrite").option("path", path).format("parquet").saveAsTable(name)
            _write_spec(path, tuple(keys), n_buckets, sort)
    return spark.table(name)


def ensure_bucketed_frame(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build,
    keys: tuple[str, ...],
    n_buckets: int = 8,
    source_tables: tuple[str, ...] = (),
) -> DataFrame:
    """Bucketed mirror of a DERIVED frame (not a raw testdata table):
    ``build(spark, sf_dir) -> DataFrame`` is materialized once,
    hash-clustered and sorted on ``keys``, and every later call returns
    the registered table. This is how an ITERATIVE workload's working
    set (a graph's edge list, a join's pre-aggregated fact side) gets
    its shuffle paid once at write time: each of the N rounds then
    scans data that already satisfies the round's HashPartitioning
    requirement — zero per-round Exchange on the big side.

    Identity = (sf_dir, tag, keys, n_buckets) + the (mtime, size) stamp
    of every named source table, so a driver-side testdata regeneration
    rewrites the mirror instead of silently serving stale rows.
    """
    stamps = []
    for t in source_tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(src)
            stamps.append(f"{t}={st.st_mtime_ns}:{st.st_size}")
        except FileNotFoundError:
            stamps.append(f"{t}=nosrc")
    h = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{tag}:{','.join(keys)}:{n_buckets}:1:{';'.join(stamps)}".encode()
    ).hexdigest()[:10]
    name = f"b_{tag}_{h}"
    if not spark.catalog.tableExists(name):
        path = os.path.join(_WAREHOUSE, name)
        if not _adopt_bucketed_files(spark, name, path, tuple(keys), n_buckets, True):
            (
                build(spark, sf_dir)
                .write.bucketBy(n_buckets, *keys)
                .sortBy(*keys)
                .mode("overwrite")
                .option("path", path)
                .format("parquet")
                .saveAsTable(name)
            )
            _write_spec(path, tuple(keys), n_buckets, True)
    return spark.table(name)


def ensure_segment(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build,
    source_tables: tuple[str, ...] = (),
) -> DataFrame:
    """Plain-parquet SEGMENT of a derived frame — the storage half of
    every incremental-index query: ``build(spark, sf_dir)`` runs once,
    the files persist, and every later call (any session) just reads
    them. This is what makes a delta query's steady-state cost honest:
    the standing corpus's index (postings, prefix table, shingle sets)
    is paid at segment-write time, and a per-batch probe touches the
    batch plus stored files — never re-deriving the base. Identity =
    (sf_dir, tag) + source-table (mtime, size) stamps, so a testdata
    regeneration rewrites the segment instead of serving stale rows."""
    stamps = []
    for t in source_tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(src)
            stamps.append(f"{t}={st.st_mtime_ns}:{st.st_size}")
        except FileNotFoundError:
            stamps.append(f"{t}=nosrc")
    h = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{tag}:{';'.join(stamps)}".encode()
    ).hexdigest()[:10]
    path = os.path.join(_WAREHOUSE, f"seg_{tag}_{h}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build(spark, sf_dir).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# -- IVF layout: cell-partitioned embedding mirror --------------------------
#
# The lakehouse form of an IVF index: vectors written partitionBy(cell)
# (one directory per coarse cell, the trained k-means assignment), the
# nlist x dim centroid table alongside. A probe then touches only the
# nprobe matching directories — on the probe's equi-join Spark applies
# DYNAMIC PARTITION PRUNING, so the scan itself skips the other cells'
# files (the plan shows the dynamicpruning subquery; asserted in
# tests/test_plans.py). This is the same nprobe/nlist scan-fraction
# story as ann_ivf_nprobe_topk, but enforced by STORAGE layout rather
# than a post-scan join — at 100 TB the difference is reading
# nprobe/nlist of the bytes vs reading everything and filtering.

_IVF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "ivf",
)


def ensure_ivf_layout(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once; idempotent per sf_dir) the cell-partitioned vector
    mirror + centroid table from the deterministic k-means fit.
    Returns (vectors_path, centroids_path)."""
    from ..operators.similarity import kmeans_fit

    # tag includes the source file's (mtime, size): a driver-side
    # testdata regeneration invalidates the mirror instead of silently
    # serving stale vectors
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    base = os.path.join(_IVF_DIR, tag)
    vecs, cents = os.path.join(base, "vectors"), os.path.join(base, "centroids")
    marker = os.path.join(base, "_DONE")
    if not os.path.exists(marker):
        emb = load_table(spark, sf_dir, "embeddings").persist()
        cent, assign = kmeans_fit(emb)
        (
            emb.select("vec_id", "embedding")
            .join(assign, "vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(vecs)
        )
        cent.write.mode("overwrite").parquet(cents)
        emb.unpersist()
        with open(marker, "w") as f:
            f.write("ok")
    return vecs, cents


def ensure_pq_books(spark: SparkSession, sf_dir: str) -> list:
    """The trained PQ codebooks as a STORED index artifact (JSON next
    to the IVF layout, keyed by the embeddings stamp): the per-subspace
    Lloyd fit is deterministic, so training once and loading thereafter
    returns bit-identical codebooks (json round-trips shortest-repr
    doubles exactly) — the m×ksub×dsub model is what a vector index
    ships alongside its cell layout, and re-deriving it per query at
    100 TB would re-scan the corpus for a model that never changed."""
    import json

    from ..operators.similarity import pq_fit

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(_IVF_DIR, tag, "pq_books.json")
    if not os.path.exists(path):
        emb = load_table(spark, sf_dir, "embeddings")
        books = pq_fit(emb)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(books, f)
        os.replace(tmp, path)
    with open(path) as f:
        return json.load(f)


# -- ORC mirror: format-portability surface ---------------------------------

_ORC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "orc",
)


def ensure_orc_mirror(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Write (once; cache keyed by the source file's mtime/size) an ORC
    mirror of ``table`` and return its path. ORC is the other
    first-class columnar format Spark ships (predicate pushdown, column
    pruning, zlib/zstd) — an engine claiming lake compatibility must
    read both; queries over the mirror hash-match their parquet
    oracles, proving the format hop is lossless for every type the
    corpus uses (strings, longs, arrays)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(_ORC_DIR, f"{table}_{tag}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, table).write.mode("overwrite").orc(path)
        with open(marker, "w") as f:
            f.write("ok")
    return path


# -- day-partitioned events mirror: the partition-pruning scale lever --------

_DAYPART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "daypart",
)

DAY_US = 86_400_000_000


def ensure_day_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write (once; cache keyed by the source file's mtime/size) the
    ``events`` table as hive-partitioned parquet on ``day_idx``
    (epoch-day of the event timestamp), rows within each day sorted by
    ``ts_micros``. Time-partitioning is the canonical 100 TB events
    layout: every time-bounded query prunes to its day directories at
    PLANNING time, and the within-file sort keeps row-group min/max
    stats tight for intra-day ranges."""
    from ..functions.scalar import ns_micros
    from .tables import save_partitioned

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(_DAYPART_DIR, tag)
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            ns_micros("ts").alias("ts_micros"),
            "user_id",
            "event_type",
            "value",
        )
        save_partitioned(
            ev.withColumn(
                "day_idx", F.expr(f"ts_micros DIV {DAY_US}").cast("int")
            ),
            path,
            ["day_idx"],
            sort_cols=["ts_micros"],
        )
        with open(marker, "w") as f:
            f.write("ok")
    return path
