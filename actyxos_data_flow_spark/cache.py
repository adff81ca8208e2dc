"""Deferred release of plan-internal caches and scratch directories.

A registered query often ``persist()``s an intermediate whose RETURNED
plan still reads the cache lazily (e.g. a signature table referenced on
both sides of a banded self-join, or a range-partitioned prefix-sum
table whose ``spark_partition_id`` must be observed by two branches).
Those caches cannot be unpersisted before returning — but never
unpersisting them either means a long-lived session (the driver grades
the full registry in ONE SparkSession) accumulates CacheManager entries
query after query.

This module ties the cache lifetime to the QUERY RESULT instead:

* plan code calls :func:`pin` instead of ``DataFrame.persist()`` (and
  :func:`pin_dir` for per-call scratch stores such as the mutable-corpus
  replay directories);
* the ``register`` decorator in :mod:`..plans` drains everything pinned
  during the query build and attaches it to the returned DataFrame with
  a ``weakref.finalize``;
* the moment the caller drops its last reference to the result — i.e.
  right after ``collect()``/``write`` in the driver's grading loop — the
  intermediates are unpersisted and the scratch dirs removed.  While the
  result is alive nothing changes, so lazy evaluation still hits the
  cache.

Single-threaded by design (the driver, ``bench.py`` and ``tools/check.py``
all build one query at a time); the pending lists are module-level, not
thread-local.
"""

from __future__ import annotations

import shutil
import weakref

from pyspark.sql import DataFrame

_PENDING_FRAMES: list[DataFrame] = []
_PENDING_DIRS: list[str] = []


def pin(df: DataFrame) -> DataFrame:
    """``persist()`` a plan-internal intermediate and track it for
    release when the enclosing registered query's result is dropped."""
    df = df.persist()
    _PENDING_FRAMES.append(df)
    return df


def pin_dir(path: str) -> str:
    """Track a per-call scratch directory for removal with the result."""
    _PENDING_DIRS.append(path)
    return path


def drain() -> tuple[list[DataFrame], list[str]]:
    """Pop everything pinned since the last drain."""
    frames, dirs = _PENDING_FRAMES[:], _PENDING_DIRS[:]
    _PENDING_FRAMES.clear()
    _PENDING_DIRS.clear()
    return frames, dirs


def release(frames: list[DataFrame], dirs: list[str]) -> None:
    """Unpersist frames / remove dirs immediately (idempotent, safe at
    interpreter shutdown when the JVM gateway may already be gone)."""
    for df in frames:
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — gateway dead / session stopped
            pass
    for p in dirs:
        shutil.rmtree(p, ignore_errors=True)


def attach(result: DataFrame, frames: list[DataFrame], dirs: list[str]) -> DataFrame:
    """Tie the pinned intermediates' lifetime to ``result`` via
    ``weakref.finalize`` — released the moment the caller drops it."""
    if frames or dirs:
        weakref.finalize(result, release, list(frames), list(dirs))
    return result
