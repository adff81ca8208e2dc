"""Bloom-filter operator invariants (operators/bloom.py).

The oracle gate (bloom_filter_stats / decontaminate_bloom) proves the
bitmap bit-for-bit against DuckDB; these tests pin the operator-level
contracts: no false negatives ever, the verified consumer is
bit-identical to the exact path, and the probe is a pure projection
(no shuffle, no Python, literal folded).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from actyxos_data_flow_spark.operators import bloom as B
from actyxos_data_flow_spark.operators import dedup as D
from actyxos_data_flow_spark.sources import load_table

from conftest import rows

SF = "/root/testdata/sf0.001"
M = 1 << 16
K = 3


def _eval_shingles(spark):
    docs = load_table(spark, SF, "documents")
    return D.shingles(docs.filter(F.col("source") == "src0")).select("shingle").distinct()


def test_no_false_negatives(spark):
    """Every inserted key must test positive — the Bloom guarantee the
    verified consumers rely on for bit-identical results."""
    ev = _eval_shingles(spark)
    dense = B.bloom_dense(B.bloom_build(ev, "shingle", M, K), M)
    misses = ev.filter(~B.bloom_contains(F.col("shingle"), dense, M, K)).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark):
    """Non-members may collide but the observed fpp must stay within
    ~4x of the analytic (1 - e^(-kn/m))^k bound (derandomized hashes
    aren't iid, so allow slack; the point is 'sparse', not 'exact')."""
    import math

    ev = _eval_shingles(spark)
    docs = load_table(spark, SF, "documents")
    probe = (
        D.shingles(docs.filter(F.col("source") != "src0"))
        .select("shingle")
        .distinct()
        .join(ev, "shingle", "left_anti")
    )
    n = ev.count()
    dense = B.bloom_dense(B.bloom_build(ev, "shingle", M, K), M)
    total = probe.count()
    fp = probe.filter(B.bloom_contains(F.col("shingle"), dense, M, K)).count()
    expect = (1 - math.exp(-K * n / M)) ** K
    assert fp / total <= max(4 * expect, 0.02), (fp, total, expect)


def test_decontaminate_bloom_bit_identical(spark):
    """The Bloom-prefiltered path returns EXACTLY the exact path's
    answer — false positives verified away, no false negatives."""
    docs = load_table(spark, SF, "documents")
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    exact = D.decontaminate(train, ev, min_overlap=2)
    bloomed = D.decontaminate_bloom(train, ev, min_overlap=2, m_bits=M, k=K)
    assert rows(exact) == rows(bloomed)


def test_probe_is_pure_projection(spark):
    """bloom_contains adds no Exchange, no join, no Python node, and
    the bitmap literal is constant-folded (no from_json survives)."""
    ev = _eval_shingles(spark)
    dense = B.bloom_dense(B.bloom_build(ev, "shingle", M, K), M)
    docs = load_table(spark, SF, "documents")
    flagged = docs.select("doc_id", B.bloom_contains(F.col("text"), dense, M, K).alias("m"))
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    opt = flagged._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "from_json" not in opt  # folded into a single literal


def test_m_bits_must_be_power_of_two():
    with pytest.raises(ValueError):
        B.bloom_positions(F.lit("x"), m_bits=1000)
    with pytest.raises(ValueError):
        B.bloom_positions(F.lit("x"), k=9)


def test_word_table_is_sparse_and_bounded(spark):
    """The build emits at most m/32 words and each word is a 32-bit
    pattern (non-negative, < 2^32) — the BIGINT-portability contract."""
    ev = _eval_shingles(spark)
    words = B.bloom_build(ev, "shingle", M, K).collect()
    assert len(words) <= M // 32
    for r in words:
        assert 0 <= r["word"] < (1 << 32)
        assert 0 <= r["word_idx"] < M // 32


def test_null_keys_dropped_and_probe_null_safe(spark):
    df = spark.createDataFrame([("x",), (None,), ("y",)], "shingle string")
    dense = B.bloom_dense(B.bloom_build(df, "shingle", M, K), M)
    # build didn't crash on the NULL; both real keys present
    assert df.filter(B.bloom_contains(F.col("shingle"), dense, M, K)).count() == 2
