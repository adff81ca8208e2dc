"""Grouped operator tests: joins, the general reduce UDAF (canonical
intra-group sort contract), named aggregates, regroup."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from actyxos_data_flow_spark.flow import Flow
from tests.conftest import rows


def _kv(spark, data):
    return spark.createDataFrame(data, "k string, v int")


def test_join_1many(spark):
    left = Flow.source(_kv(spark, [("a", 1), ("a", 2), ("b", 3)])).group_by("k")
    right = Flow.source(spark.createDataFrame([("a", 10), ("b", 20)], "k2 string, w int")).group_by("k2")
    out = left.join(right, "k", "v", "w")
    assert rows(out.df) == [("a", 1, 10), ("a", 2, 10), ("b", 3, 20)]
    assert out.stateful is True


def test_reduce_sees_sorted_group_and_emits_many(spark):
    """G5 contract (/root/reference/src/flow.rs:522-528): UDAF gets the
    group sorted by record Ord and may emit 0..n rows per key."""
    df = _kv(spark, [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("c", 5)])

    def first_two(pdf: pd.DataFrame) -> pd.DataFrame:
        # input must arrive sorted by v (canonical Ord)
        assert list(pdf["v"]) == sorted(pdf["v"])
        out = pdf.head(2)[["k", "v"]]
        return out if len(pdf) > 1 else out.iloc[0:0]  # emit nothing for singleton groups

    got = Flow.source(df).group_by("k").reduce(first_two, "k string, v int", sort_cols=["v"])
    assert rows(got.df) == [("a", 1), ("a", 2)]


def test_min_max_record_struct_ord(spark):
    df = spark.createDataFrame(
        [("x", 2, "b"), ("x", 2, "a"), ("x", 1, "z"), ("y", 5, "q")], "k string, a int, b string"
    )
    g = Flow.source(df).group_by("k")
    assert rows(g.min_record().df) == [("x", 1, "z"), ("y", 5, "q")]
    assert rows(g.max_record().df) == [("x", 2, "b"), ("y", 5, "q")]


def test_max_by_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("x", 1, "p"), ("x", 1, "q"), ("y", 2, "r")], "k string, s int, payload string"
    )
    got = Flow.source(df).group_by("k").max_by("s")
    # tie on s for k=x → larger full record (s, payload) wins: "q"
    assert rows(got.df) == [("x", 1, "q"), ("y", 2, "r")]


def test_regroup(spark):
    df = _kv(spark, [("a", 1), ("a", 1), ("b", 1), ("c", 2)])
    per_k = Flow.source(df).group_by("k").count()
    hist = per_k.group_by("count").agg(F.count(F.lit(1)).alias("n_keys"))
    assert rows(hist.df) == [(1, 2), (2, 1)]


def test_computed_group_key(spark):
    df = _kv(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)])
    got = Flow.source(df).group_by((F.col("v") % 2).alias("parity")).count()
    assert rows(got.df) == [(0, 2), (1, 2)]


def test_string_key_resolution_no_positional_fallback(spark):
    df = _kv(spark, [("a", 1), ("b", 2)])
    # str key resolves by NAME even though 'v' is not the 0th column
    got = Flow.source(df).group_by("v").count()
    assert sorted(rows(got.df)) == [(1, 1), (2, 1)]
    with pytest.raises(ValueError, match="unknown group key"):
        Flow.source(df).group_by("nope")


def test_computed_key_requires_alias(spark):
    df = _kv(spark, [("a", 1)])
    with pytest.raises(ValueError, match="alias"):
        Flow.source(df).group_by(F.col("v") % 2)


def test_aliased_key_shadowing_column_groups_by_expression(spark):
    df = _kv(spark, [("a", 1), ("b", 2), ("c", 3)])
    # alias collides with existing column 'v': must group by the
    # EXPRESSION, not the original column
    got = Flow.source(df).group_by((F.col("v") % 2).alias("v")).count()
    assert sorted(rows(got.df)) == [(0, 1), (1, 2)]


def test_grouped_count_drops_negative_net_keys(spark):
    """G8 delta space: a key whose retractions exceed insertions has net
    multiplicity <= 0 and must be ABSENT from the materialized count —
    same net-positive-presence rule as distinct/_net_counts."""
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 1, -1), ("b", 2, -1), ("c", 1, 1), ("c", 1, -1)],
        "k string, v int, delta int",
    )
    got = Flow.source(df).group_by("k").count()
    assert sorted(tuple(r) for r in got.df.collect()) == [("a", 2)]
