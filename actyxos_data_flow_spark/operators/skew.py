"""Skew-mitigation helpers: salted joins and sharded distinct counts.

A shuffle keyed on a skewed column funnels the hot key's rows into one
task; AQE's skew-join split handles the *sort-merge* case at runtime,
but salting is the planning-time answer that also covers aggregations
and works under any join strategy:

- :func:`salted_join` fans the LEFT (big, skewed) side out over ``n``
  deterministic salt buckets and replicates the RIGHT side ``n`` times,
  so the hot key's rows spread across ``n`` tasks. Row-for-row identical
  to the plain join (each left row joins exactly its own salt replica).
- :func:`salted_count_distinct` shards a distinct-count by a hash of the
  counted value: per-(key, shard) distincts are disjoint, so the final
  per-key sum is exact while no task ever holds a hot key's full value
  set.

Salts are DETERMINISTIC (xxhash64 of row content, not ``rand()``): plans
stay replayable, retried tasks produce identical output (speculative
execution safe), and DuckDB oracles can replicate results exactly
(salting never changes results, only placement — the oracles are the
plain unsalted SQL).

Reference parity: the reference engine is single-node and has no shuffle
to skew (`/root/reference/src/flow.rs` processes deltas in-order); these
helpers exist for the 100 TB Spark deployment the reference never faced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n: int, salt_expr: Column | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n): pmod(xxhash64(all columns))
    unless ``salt_expr`` names a better-distributed expression (e.g. a
    unique id column — cheaper to hash than the full row)."""
    expr = salt_expr if salt_expr is not None else F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(SALT_COL, F.pmod(expr, F.lit(n)).cast("int"))


def explode_salt(df: DataFrame, n: int) -> DataFrame:
    """Replicate every row once per salt value (the small-side dual of
    :func:`with_salt`). Multiplies the side by n — use on the side that
    is too big to broadcast but far smaller than the skewed side."""
    return df.withColumn(SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n)])))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n: int = 16,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Join a skewed ``left`` to a non-broadcastable ``right`` on
    ``left_on = right_on``, spreading each hot key over ``n`` tasks.

    The join keys become (key, salt): left rows carry one deterministic
    salt each, right rows are replicated across all n salts, so every
    left row still meets every matching right row exactly once. Works
    for ``inner`` and ``left`` joins (right/full would need the salting
    mirrored). Cost model: right side is scanned/shuffled n×; pick n ≈
    (hot-key row count) / (rows a task should hold)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left; mirror the salting for right/full")
    lf = with_salt(left, n, salt_expr)
    rt = explode_salt(right, n)
    cond = (lf[left_on] == rt[right_on]) & (lf[SALT_COL] == rt[SALT_COL])
    return lf.join(rt, cond, how).drop(SALT_COL)


def salted_count_distinct(
    df: DataFrame, keys: Sequence[str], col: str, n: int = 16, out: str | None = None
) -> DataFrame:
    """Exact distinct count per key group, sharded so no single task
    materializes a hot key's whole distinct set: phase 1 counts
    distincts within (keys, hash(value) % n) — disjoint value sets —
    phase 2 sums the n shard counts per key. Both phases are ordinary
    hash aggregates with map-side partial aggregation."""
    out = out or f"{col}_distinct"
    shard = F.pmod(F.xxhash64(F.col(col)), F.lit(n)).alias(SALT_COL)
    partial = df.groupBy(*keys, shard).agg(F.count_distinct(F.col(col)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias(out))
