"""functions/intlog unit tests: the exact integer log2 kernel must (a)
track true log2 within its documented error, (b) agree bit-for-bit
between the Spark expression chain and the plain-Python twin (the
property the DSIR oracle gate relies on), and (c) rank-order correctly
so scores built on it order documents the way true log-ratios would."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from actyxos_data_flow_spark.functions.intlog import (
    ILOG_ONE,
    ilog2_cols,
    py_ilog2_fp20,
)


@given(
    num=st.integers(min_value=1, max_value=(1 << 33) - 1),
    den=st.integers(min_value=1, max_value=(1 << 30) - 1),
)
@settings(max_examples=300, deadline=None)
def test_py_ilog2_tracks_log2(num, den):
    got = py_ilog2_fp20(num, den) / ILOG_ONE
    true = math.log2(num / den)
    # two truncation sources: the initial y0 = trunc(num·2^30/den)
    # contributes ≤ 1/(y0·ln2); the 20 mantissa squarings compound
    # ≤ 2^-30 per step to ≤ 2^-10 relative (~1.4e-3 in log2). Typical
    # inputs land ~1e-5. Accuracy is secondary — the kernel's contract
    # is bit-exact reproducibility, not tightness.
    y0 = (num << 30) // den
    assert abs(got - true) < 1.0 / (y0 * math.log(2)) + 1.5e-3
    assert got <= true + 1.0 / ILOG_ONE  # truncation never overshoots


def test_py_ilog2_exact_on_powers_of_two():
    for k in range(-20, 33):
        v = py_ilog2_fp20(1 << k, 1) if k >= 0 else py_ilog2_fp20(1, 1 << -k)
        assert v == k * ILOG_ONE


def test_py_ilog2_monotone():
    vals = [py_ilog2_fp20(n, 1000) for n in range(1, 5000, 7)]
    assert vals == sorted(vals)


def test_spark_kernel_matches_python_twin(spark):
    import random

    random.seed(42)
    rows = [
        (random.randrange(1, 1 << 33), random.randrange(1, 1 << 30))
        for _ in range(500)
    ] + [(1, 1), (1, (1 << 30) - 1), ((1 << 33) - 1, 1), (3, 7), (7, 3)]
    df = (
        spark.createDataFrame(rows, "num long, den long")
        .withColumn("y0", F.expr(f"(num * {1 << 30}) DIV den"))
        .filter(F.col("y0") > 0)
        .withColumn("blen", F.length(F.conv(F.col("y0"), 10, 2)).cast("int"))
    )
    for col, expr in ilog2_cols("y0", "blen", div="DIV"):
        df = df.withColumn(col, F.expr(expr))
    for r in df.select("num", "den", "ilog2_fp20").collect():
        assert r["ilog2_fp20"] == py_ilog2_fp20(r["num"], r["den"]), (r["num"], r["den"])


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs full of target-domain vocabulary outscore off-domain docs;
    the selection is deterministic across physical layouts."""
    from actyxos_data_flow_spark.operators.text import dsir_select

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta"), (2, "zz qq ww ee rr"),
         (3, "alpha zz beta qq gamma"), (4, "mm nn oo pp qq")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["rank"] for r in dsir_select(raw, target, k=4).collect()}
    assert out[1] == 1  # pure target vocab ranks first
    assert out[1] < out[3] < out[2] or out[1] < out[3] < out[4]
    out2 = {
        r["doc_id"]: r["rank"]
        for r in dsir_select(raw.repartition(5), target.repartition(3), k=4).collect()
    }
    assert out == out2


def test_dsir_delta_uses_frozen_model(spark):
    """The delta batch is scored under the BASE model: a delta-only
    token (unseen bucket) contributes the smoothed ccnt=0 score, and
    re-running with the batch folded into the base changes the model
    (so the frozen-path result is genuinely incremental, not a rerun)."""
    from actyxos_data_flow_spark.operators.text import (
        dsir_delta_select,
        dsir_model,
        dsir_score_topk,
    )

    target = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )
    base = spark.createDataFrame(
        [(1, "alpha zz beta"), (2, "qq ww ee")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(3, "alpha beta gamma"), (4, "brandnewword qq")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dsir_delta_select(base, delta, target, k=2).collect()}
    assert set(out) == {3, 4} and out[3]["rank"] == 1  # target-like doc wins
    # frozen-model scoring == model(base) applied to delta, by construction
    bkt, kc = dsir_model(base, target)
    direct = {r["doc_id"]: r for r in dsir_score_topk(delta, bkt, kc, k=2).collect()}
    assert {d: r["dsir_score_ilfp20"] for d, r in out.items()} == {
        d: r["dsir_score_ilfp20"] for d, r in direct.items()
    }
