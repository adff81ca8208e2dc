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


def test_pin_dir_removed_with_window(spark):
    cache.release_retired()
    d = cache.pin_dir(tempfile.mkdtemp(prefix="cache_test_"))
    frames, dirs = cache.drain()
    result = spark.range(1)
    cache.attach(result, frames, dirs)
    del result
    assert os.path.isdir(d)  # still inside the retirement window
    cache.release_retired()
    assert not os.path.exists(d)


def test_drain_isolates_queries(spark):
    cache.release_retired()
    a = cache.pin(spark.range(5))
    assert cache.drain()[0] == [a]
    assert cache.drain() == ([], [])  # second drain is empty
    cache.release([a], [])
    assert not a.storageLevel.useMemory
