"""Deterministic Bloom filters as DataFrame operators.

The standard big-data trick Spark only applies internally (runtime
bloom-filter join pruning): when the build side of a semi-join is too
large to broadcast as raw keys but its MEMBERSHIP can be approximated
in a few megabits, build a Bloom filter distributedly, broadcast the
finished bitmap, and prune the probe side with a pure projection before
the exact join. False positives only add candidates — the exact join
removes them — so any *verified* consumer (e.g. decontamination)
returns bit-identical results to the unfiltered plan.

Everything is derandomized and engine-portable:

- k probe positions per key via Kirsch-Mitzenmacher double hashing of
  two 60-bit md5 pieces (the same arithmetic as
  :func:`operators.dedup.minhash_signatures`, so DuckDB replicates the
  bit layout exactly);
- the bitmap is 32-bit words stored in BIGINTs (no sign-bit portability
  traps), built with one map-side-combined ``bit_or`` aggregate —
  at 100 TB the build is a single shuffle of at most ``m/32`` words per
  map partition, and only the finished ``m/8``-byte bitmap crosses the
  driver (same cost class as any broadcast variable);
- the probe enters the plan as ONE constant-folded array literal
  (:func:`operators.similarity._matrix_lit` trick), so membership tests
  are whole-plan projections: no join, no shuffle, no Python.

Sizing rule of thumb: fpp ≈ (1 - e^(-k·n/m))^k; with k=4 and m/n = 16
bits/key, fpp ≈ 2.4%. ``m_bits`` must be a power of two (pmod becomes
a bitmask on both engines; also keeps DuckDB's % exact on BIGINT).

The reference has no approximate structures at all (it materializes
exact state in SQL tables — src/db/mod.rs); this module is extension
surface for the 100 TB training-data pipeline, where eval corpora can
carry hundreds of millions of shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 20
BLOOM_K = 4

_WORD_BITS = 32
_WORD_SHIFT = 5  # log2(_WORD_BITS)


def _pieces(col: Column) -> tuple[Column, Column]:
    """Two independent 60-bit unsigned pieces of md5(key), as longs —
    identical to dedup._md5_piece so oracles share one formulation."""
    h = F.md5(col.cast("binary"))
    p1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    p2 = F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
    return p1, p2


def bloom_positions(col: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> list[Column]:
    """k bit positions in [0, m_bits) for one key: h_i = p1 + i·p2
    (mod m). i ≤ k-1 ≤ 7 keeps p1 + i·p2 < 2^63: no overflow on either
    engine; pmod of non-negatives is plain % everywhere."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    if k > 8:
        raise ValueError("k > 8 would overflow the 60-bit double-hash family")
    p1, p2 = _pieces(col)
    return [F.pmod(p1 + F.lit(i) * p2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str = "shingle", m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Distributed Bloom build → sparse word table (word_idx INT,
    word BIGINT holding a 32-bit pattern). One explode (k rows/key) and
    one hash aggregate whose map-side partial combine caps every
    partition's shuffle contribution at m/32 words regardless of key
    count — the build never concentrates keys anywhere. NULL keys are
    dropped (a NULL key has no md5 and can never be probed for — the
    contains predicate is NULL for NULL input, falsy in filters)."""
    pos = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*bloom_positions(F.col(key_col), m_bits, k))).alias("pos")
    )
    word = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.col("pos").bitwiseAND(_WORD_BITS - 1).cast("int")
    )
    return (
        pos.select(F.shiftright(F.col("pos"), _WORD_SHIFT).cast("int").alias("word_idx"), word.alias("w"))
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("word"))
    )


def bloom_dense(words: DataFrame, m_bits: int = BLOOM_M_BITS) -> list[int]:
    """Collect the sparse word table into a dense Python list of
    m_bits/32 ints — the finished bitmap (m/8 bytes on the driver; the
    only driver-side materialization in the bloom path)."""
    arr = [0] * (m_bits // _WORD_BITS)
    for r in words.collect():
        arr[int(r["word_idx"])] = int(r["word"])
    return arr


def bloom_contains(
    col: Column, dense: list[int], m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> Column:
    """Membership predicate as a PURE PROJECTION: the bitmap enters the
    plan as one constant-folded array literal; the test is k
    element_at + bitwise-AND ops. No join, no shuffle, no Python."""
    from .similarity import _vector_lit

    words = _vector_lit(dense, "bigint")
    checks = []
    for pos in bloom_positions(col, m_bits, k):
        widx = F.shiftright(pos, _WORD_SHIFT).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), pos.bitwiseAND(_WORD_BITS - 1).cast("int")
        )
        checks.append((F.element_at(words, widx + F.lit(1)).bitwiseAND(bit)) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
