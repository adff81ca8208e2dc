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
* when the caller drops its last reference to the result — i.e. right
  after ``collect()``/``write`` in the driver's grading loop — the
  group RETIRES into a small FIFO pool, and only once
  ``RETAIN_QUERIES`` newer groups have retired behind it is it actually
  unpersisted / removed.  While the result is alive nothing changes, so
  lazy evaluation still hits the cache.

Why a retirement pool instead of releasing immediately: the hazard
being fixed is UNBOUNDED accumulation across a session grading ~190
DIFFERENT queries — bounded-at-a-few-queries is exactly as safe. But
an immediate release would also defeat Spark's CacheManager
logical-plan matching for REPEATED runs of the same query (bench.py's
warm passes, a dashboard refreshing one view): the pool keeps the last
couple of queries' caches alive, so re-running a query re-persists the
identical plan and CacheManager serves the still-warm entry. An
early-evicted PERSIST entry that no live pin still references only
costs a deterministic recompute; an entry a LIVE pin references must
never be dropped early — CacheManager dedupes equal plans into one
shared entry, so releases are refcounted per canonical plan (see
_PIN_COUNTS below for the failure this prevents).

:func:`pin_dir` scratch DIRECTORIES are different: there is no
recompute path for deleted files. The contract for callers is
therefore stricter — keep the returned query result alive for as long
as ANY DataFrame derived from it may still be evaluated. If a caller
derives a child frame, drops the parent result, and lets
``RETAIN_QUERIES`` newer queries retire behind it, the scratch parquet
the child lazily reads is gone and evaluation fails (loudly — never a
wrong answer, the files are whole-directory removed). The registered
grading/bench/check loops all collect before dropping, which satisfies
the contract; ad-hoc composition should either re-run the registered
query or hold the original result.

Single-threaded by design (the driver, ``bench.py`` and ``tools/check.py``
all build one query at a time); the pending lists are module-level, not
thread-local.
"""

from __future__ import annotations

import shutil
import weakref
from collections import deque

from pyspark.sql import DataFrame

_PENDING_FRAMES: list[DataFrame] = []
_PENDING_DIRS: list[str] = []

# groups retired by finalize, oldest first; len > RETAIN_QUERIES => the
# oldest group is truly released. 2 keeps min-of-N warm bench passes and
# back-to-back composed queries cache-hot while the grading loop stays
# bounded at ~3 queries' worth of cached blocks.
RETAIN_QUERIES = 2
_RETIRED: deque[tuple[list[DataFrame], list[str]]] = deque()


# Refcount of live pins per CANONICAL PLAN: Spark's CacheManager dedupes
# persist() calls on semantically-equal plans into ONE cache entry (the
# "Asked to cache already cached data" warning), so two queries that pin
# the same plan share one entry — and an early release by the FIRST
# query's retirement would yank the entry out from under the SECOND
# query mid-evaluation. For value-deterministic plans that only costs a
# recompute, but pack_sequences' `_pid` pin exists precisely because its
# two branches must observe ONE materialization (losing it mid-plan
# de-synchronizes the branch range-shuffles and silently drops rows —
# observed as export_shard_manifest losing whole bins at sf0.1 in long
# grading sessions). unpersist() therefore only fires when the LAST pin
# of a plan releases.
_PIN_COUNTS: dict[int, int] = {}


def _plan_key(df: DataFrame) -> int:
    try:
        return int(df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:  # noqa: BLE001 — gateway dead / foreign frame
        return id(df)


def pin(df: DataFrame) -> DataFrame:
    """``persist()`` a plan-internal intermediate and track it for
    release when the enclosing registered query's result is dropped.
    Pins are REFCOUNTED by canonical plan (see _PIN_COUNTS)."""
    df = df.persist()
    key = _plan_key(df)
    _PIN_COUNTS[key] = _PIN_COUNTS.get(key, 0) + 1
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
    """Release pins / remove dirs (idempotent, safe at interpreter
    shutdown when the JVM gateway may already be gone). A frame's
    shared cache entry is only unpersisted when ITS plan's refcount
    reaches zero — a newer query may have pinned the same plan and
    still be reading the entry."""
    for df in frames:
        try:
            key = _plan_key(df)
            n = _PIN_COUNTS.get(key, 1) - 1
            if n > 0:
                _PIN_COUNTS[key] = n
                continue
            _PIN_COUNTS.pop(key, None)
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — gateway dead / session stopped
            pass
    for p in dirs:
        shutil.rmtree(p, ignore_errors=True)


def _retire(frames: list[DataFrame], dirs: list[str]) -> None:
    """Finalize hook: queue the group; release whatever the retirement
    window has pushed out."""
    _RETIRED.append((frames, dirs))
    while len(_RETIRED) > RETAIN_QUERIES:
        release(*_RETIRED.popleft())


def release_retired() -> None:
    """Drain the whole retirement pool now (tests / explicit cleanup)."""
    while _RETIRED:
        release(*_RETIRED.popleft())


def attach(result: DataFrame, frames: list[DataFrame], dirs: list[str]) -> DataFrame:
    """Tie the pinned intermediates' lifetime to ``result`` via
    ``weakref.finalize``: when the caller drops the result the group
    retires, and the retirement window releases the oldest group."""
    if frames or dirs:
        weakref.finalize(result, _retire, list(frames), list(dirs))
    return result
