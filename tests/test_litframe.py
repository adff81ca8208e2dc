"""values_frame (functions/litframe.py): the canonicalization-friendly
literal-frame helper that replaced createDataFrame for model-sized
driver-built tables. Three contracts: (1) values survive the SQL
round-trip exactly — including the escaping-sensitive cases — (2) two
identical builds are sameResult (the whole reason the helper exists),
and (3) the empty frame is typed and empty."""

from __future__ import annotations

import pytest

from actyxos_data_flow_spark.functions.litframe import values_frame


def _same(a, b) -> bool:
    return a._jdf.queryExecution().analyzed().sameResult(b._jdf.queryExecution().analyzed())


def test_values_frame_roundtrips_escaping_and_types(spark):
    rows = [
        ("plain", 1, True),
        ("it's quoted", -(2**62), False),
        ('back\\slash and "doubles"', 0, None),
        (None, 2**62, True),
        ("unicode: héllo 日本", 42, False),
    ]
    df = values_frame(spark, rows, ["s", "n", "b"], ["string", "bigint", "boolean"])
    assert df.schema.simpleString() == "struct<s:string,n:bigint,b:boolean>"
    got = sorted(
        ((r["s"], r["n"], r["b"]) for r in df.collect()),
        key=lambda t: (t[0] is None, str(t[0])),
    )
    expect = sorted(rows, key=lambda t: (t[0] is None, str(t[0])))
    assert got == expect


def test_values_frame_identical_builds_are_sameResult(spark):
    rows = [("a", 3), ("b", 2)]
    d1 = values_frame(spark, rows, ["g", "x"], ["string", "bigint"])
    d2 = values_frame(spark, rows, ["g", "x"], ["string", "bigint"])
    assert _same(d1, d2)
    # ... which createDataFrame twins are NOT (the gotcha this guards)
    c1 = spark.createDataFrame(rows, "g string, x long")
    c2 = spark.createDataFrame(rows, "g string, x long")
    assert not _same(c1, c2)
    # different data -> different result
    d3 = values_frame(spark, [("a", 4), ("b", 2)], ["g", "x"], ["string", "bigint"])
    assert not _same(d1, d3)


def test_values_frame_downstream_joins_stay_sameResult(spark):
    """The property that matters in production: a JOIN built on two
    identically-built literal frames canonicalizes equal, so repeated
    query invocations dedupe onto warm cache entries."""
    from pyspark.sql import functions as F

    base = spark.range(100).withColumn("g", F.pmod("id", 3).cast("string"))

    def build():
        dom = values_frame(spark, [("0", 7), ("1", 9)], ["g", "w"], ["string", "bigint"])
        return base.join(F.broadcast(dom), "g").withColumn("y", F.col("id") * F.col("w"))

    assert _same(build(), build())


def test_values_frame_empty_and_errors(spark):
    e = values_frame(spark, [], ["a", "b"], ["string", "bigint"])
    assert e.schema.simpleString() == "struct<a:string,b:bigint>"
    assert e.count() == 0
    with pytest.raises(TypeError):
        values_frame(spark, [([1],)], ["x"], ["array<int>"])  # containers refused


def test_values_frame_widened_literal_types(spark):
    """ADVICE r11: epoch_schedule routes the GROUP column through
    values_frame, so date/timestamp/decimal/float group keys must
    render (createDataFrame handled them before the VALUES rewrite)."""
    import datetime
    import decimal

    rows = [
        (
            datetime.date(2024, 2, 29),
            datetime.datetime(2024, 2, 29, 23, 59, 59, 123456),
            decimal.Decimal("12345.67"),
            -0.1,
        ),
        (None, None, None, None),
    ]
    df = values_frame(
        spark,
        rows,
        ["d", "ts", "m", "x"],
        ["date", "timestamp", "decimal(12,2)", "double"],
    )
    got = sorted(df.collect(), key=lambda r: (r["d"] is None,))
    assert (got[0]["d"], got[0]["ts"], got[0]["m"], got[0]["x"]) == rows[0]
    assert all(got[1][c] is None for c in ("d", "ts", "m", "x"))
    # sameResult still holds for the widened types
    d2 = values_frame(
        spark, rows, ["d", "ts", "m", "x"], ["date", "timestamp", "decimal(12,2)", "double"]
    )
    assert _same(df, d2)
