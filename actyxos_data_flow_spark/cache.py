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
recompute path for deleted files, so (since round 9) they are
SESSION-scoped, not window-scoped — registered once, removed only at
interpreter exit (``atexit``) or an explicit
:func:`cleanup_session_dirs`. A child frame derived from a dropped
parent result therefore still evaluates at ANY later point in the
session (tests/test_cache.py::test_child_frame_outlives_parent_result);
the cost is bounded scratch-disk growth over one session, which the
grading/bench/check loops' tempdirs keep in the tens of MB.

Single-threaded by design (the driver, ``bench.py`` and ``tools/check.py``
all build one query at a time); the pending lists are module-level, not
thread-local.
"""

from __future__ import annotations

import atexit
import shutil
import weakref
from collections import deque

from pyspark.sql import DataFrame

# (plan_key, frame) pairs: the key is computed ONCE at pin time, so the
# release path decrements exactly the counter the pin incremented even
# if key computation would diverge later (JVM gateway death downgrades
# _plan_key to id(df) — recomputing at release would then leak the
# pin-time counter and a later pin of the same plan would inherit a
# stale count, skipping its final unpersist).
_PENDING_FRAMES: list[tuple[int, DataFrame]] = []
_SESSION_DIRS: list[str] = []
_ATEXIT_ARMED = False

# groups retired by finalize, oldest first; len > RETAIN_QUERIES => the
# oldest group is truly released. 2 keeps min-of-N warm bench passes and
# back-to-back composed queries cache-hot while the grading loop stays
# bounded at ~3 queries' worth of cached blocks.
RETAIN_QUERIES = 2
_RETIRED: deque[tuple[list[tuple[int, DataFrame]], list[str]]] = deque()


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
    Pins are REFCOUNTED by canonical plan (see _PIN_COUNTS); the plan
    key is computed HERE and carried with the frame, so release always
    decrements the exact counter this pin incremented."""
    df = df.persist()
    key = _plan_key(df)
    _PIN_COUNTS[key] = _PIN_COUNTS.get(key, 0) + 1
    _PENDING_FRAMES.append((key, df))
    return df


def pin_dir(path: str) -> str:
    """Register a per-call scratch directory for SESSION-lifetime
    cleanup (atexit / :func:`cleanup_session_dirs`) — never removed by
    the retirement window, so frames lazily reading the files stay
    evaluable for the whole session."""
    global _ATEXIT_ARMED
    _SESSION_DIRS.append(path)
    if not _ATEXIT_ARMED:
        atexit.register(cleanup_session_dirs)
        _ATEXIT_ARMED = True
    return path


def cleanup_session_dirs() -> None:
    """Remove every scratch directory registered this session
    (idempotent; runs automatically at interpreter exit)."""
    while _SESSION_DIRS:
        shutil.rmtree(_SESSION_DIRS.pop(), ignore_errors=True)


def drain() -> tuple[list[tuple[int, DataFrame]], list[str]]:
    """Pop every frame pinned since the last drain. (The dirs slot is
    retained for API shape; scratch dirs are session-scoped now and no
    longer flow through the retirement groups.)"""
    frames = _PENDING_FRAMES[:]
    _PENDING_FRAMES.clear()
    return frames, []


def release(frames: list[tuple[int, DataFrame]], dirs: list[str]) -> None:
    """Release pins (idempotent, safe at interpreter shutdown when the
    JVM gateway may already be gone). A frame's shared cache entry is
    only unpersisted when ITS plan's refcount reaches zero — a newer
    query may have pinned the same plan and still be reading the
    entry. ``dirs`` passed explicitly are removed immediately (legacy
    direct callers); session dirs never arrive here."""
    for key, df in frames:
        try:
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
