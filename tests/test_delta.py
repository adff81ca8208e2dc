"""Delta/retraction layer tests (consolidate, snapshot_diff, apply_delta)
— the reference's Coll consolidation and per-epoch delta semantics
(/root/reference/src/coll.rs:25-101, src/flow.rs:129-146)."""

from __future__ import annotations

from pyspark.sql import functions as F

from actyxos_data_flow_spark.delta import apply_delta, consolidate, snapshot_diff, with_delta
from tests.conftest import rows


def test_consolidate_nets_out(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", -1), ("b", -1), ("c", 2), ("c", -2)], "v string, delta int"
    )
    got = consolidate(df)
    assert rows(got) == [("a", 1), ("b", -1)]


def test_consolidate_multiplicity_gt1(spark):
    """Reference DB tests use mult +2 (/root/reference/src/db/sqlite.rs:295)."""
    df = with_delta(spark.createDataFrame([("x",), ("x",), ("y",)], "v string"))
    got = consolidate(df)
    assert rows(got) == [("x", 2), ("y", 1)]


def test_snapshot_diff_and_apply_roundtrip(spark):
    old = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    new = spark.createDataFrame([("a",), ("c",), ("c",)], "v string")
    d = snapshot_diff(old, new)
    assert rows(d) == [("a", -1), ("b", -1), ("c", 2)]
    roundtrip = apply_delta(old, d)
    assert rows(roundtrip) == rows(new)


def test_snapshot_diff_empty_when_equal(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    assert snapshot_diff(df, df).count() == 0
