"""Deferred cache release (actyxos_data_flow_spark/cache.py): pins ride
with the query result, retire when it is dropped, and are truly
unpersisted only once the retirement window pushes them out."""

from __future__ import annotations

import os
import tempfile

from actyxos_data_flow_spark import cache


def _run_query_with_pin(spark, n):
    """Simulate one registered query: pin an intermediate, attach the
    drained pins to a result, return (pinned df, result)."""
    pinned = cache.pin(spark.range(n))
    pinned.count()  # materialize the cache
    frames, dirs = cache.drain()
    result = spark.range(1)
    cache.attach(result, frames, dirs)
    return pinned, result


def test_retirement_window_bounds_cached_blocks(spark):
    cache.release_retired()
    pins = []
    for i in range(cache.RETAIN_QUERIES + 2):
        pinned, result = _run_query_with_pin(spark, 100 + i)
        assert pinned.storageLevel.useMemory  # live while result held
        pins.append(pinned)
        del result  # drop the query result -> group retires
    # the two oldest groups fell out of the window and were unpersisted
    assert not pins[0].storageLevel.useMemory
    assert not pins[1].storageLevel.useMemory
    # the newest RETAIN_QUERIES groups stay warm (CacheManager reuse for
    # a repeated run of the same query)
    for p in pins[-cache.RETAIN_QUERIES:]:
        assert p.storageLevel.useMemory
    cache.release_retired()
    assert all(not p.storageLevel.useMemory for p in pins)


def test_pin_dir_is_session_scoped(spark):
    """Scratch dirs survive the retirement window for the whole session
    (no recompute path exists for deleted files); cleanup_session_dirs
    (the atexit hook) is what removes them."""
    cache.release_retired()
    d = cache.pin_dir(tempfile.mkdtemp(prefix="cache_test_"))
    frames, dirs = cache.drain()
    result = spark.range(1)
    cache.attach(result, frames, dirs)
    del result
    cache.release_retired()
    assert os.path.isdir(d)  # window passed; dir still alive
    cache.cleanup_session_dirs()
    assert not os.path.exists(d)


def test_child_frame_outlives_parent_result(spark):
    """A frame derived from a registered query's result must evaluate
    even after the parent result is dropped and the retirement window
    has rolled past it — the round-8 documented contract violation this
    module's session-scoped dirs close."""
    import pyspark.sql.functions as F

    cache.release_retired()
    base = cache.pin_dir(tempfile.mkdtemp(prefix="cache_child_"))
    spark.range(50).withColumn("v", F.col("id") * 2).write.parquet(base + "/t")
    parent = spark.read.parquet(base + "/t")
    cache.attach(parent, *cache.drain())
    child = parent.filter(F.col("v") >= 40).select(F.sum("v").alias("s"))
    del parent  # drop the result; group retires
    for i in range(cache.RETAIN_QUERIES + 2):  # roll the window past it
        _, r = _run_query_with_pin(spark, 10 + i)
        del r
    assert child.collect()[0]["s"] == sum(v * 2 for v in range(20, 50))
    cache.cleanup_session_dirs()


def test_drain_isolates_queries(spark):
    cache.release_retired()
    a = cache.pin(spark.range(5))
    drained = cache.drain()
    assert [df for _, df in drained[0]] == [a]
    assert cache.drain() == ([], [])  # second drain is empty
    cache.release(drained[0], [])
    assert not a.storageLevel.useMemory


def test_release_is_refcounted_per_plan(spark):
    """CacheManager dedupes persist() of semantically-equal plans into
    ONE shared entry, so releasing an OLDER query's pin must not yank
    the entry out from under a NEWER pin of the same plan (observed:
    export_shard_manifest silently losing whole bins at sf0.1 when the
    retirement pool released pipeline_training_batches' `_pid` pin
    while export's rebuilt-and-re-pinned copy was mid-evaluation).
    Only the LAST release of a plan unpersists."""
    from actyxos_data_flow_spark import cache

    df1 = cache.pin(spark.range(100).selectExpr("id", "id * 3 AS v"))
    df1.count()
    f1, d1 = cache.drain()
    # a second query pins the SAME logical plan (fresh DataFrame object)
    df2 = cache.pin(spark.range(100).selectExpr("id", "id * 3 AS v"))
    f2, d2 = cache.drain()
    assert df2.storageLevel.useMemory
    # older query's release must keep the shared entry alive
    cache.release(f1, d1)
    assert df2.storageLevel.useMemory, "shared cache entry dropped early"
    # the last pin's release actually unpersists
    cache.release(f2, d2)
    assert not df2.storageLevel.useMemory
