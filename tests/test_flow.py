"""Flow operator unit tests mirroring the reference's golden-delta style
(/root/reference/src/flow.rs:616-640 via Machine::assert): feed batches,
snapshot, assert exact consolidated deltas including retractions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from actyxos_data_flow_spark.delta import snapshot_diff
from actyxos_data_flow_spark.flow import Flow
from tests.conftest import rows


def _scalar(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value int")


def test_filter_map(spark):
    f = Flow.source(_scalar(spark, [1, 2, 3, 4])).filter(F.col("value") % 2 == 0).map((F.col("value") * 10).alias("v"))
    assert rows(f.df) == [(20,), (40,)]
    assert f.stateful is False


def test_flat_map(spark):
    f = Flow.source(_scalar(spark, [2, 3])).flat_map(F.expr("sequence(1, value)"), alias="x")
    assert rows(f.df) == [(1,), (1,), (2,), (2,), (3,)]


def test_concat_multiset_and_distinct(spark):
    a = Flow.source(_scalar(spark, [1, 2]))
    b = Flow.source(_scalar(spark, [2, 3]))
    u = a.concat(b)
    assert rows(u.df) == [(1,), (2,), (2,), (3,)]
    assert rows(u.distinct().df) == [(1,), (2,), (3,)]
    assert u.distinct().stateful is True


def test_threshold_clip(spark):
    f = Flow.source(_scalar(spark, [1, 1, 1, 2])).threshold(lambda m: F.least(m, F.lit(2)))
    assert rows(f.df) == [(1,), (1,), (2,)]


def test_count_values(spark):
    f = Flow.source(_scalar(spark, [1, 1, 2])).count_values()
    assert rows(f.df) == [(1, 2), (2, 1)]


def test_except_intersect(spark):
    a = Flow.source(_scalar(spark, [1, 1, 2, 3]))
    b = Flow.source(_scalar(spark, [1, 3, 4]))
    assert rows(a.except_all(b).df) == [(1,), (2,)]
    assert rows(a.intersect_all(b).df) == [(1,), (3,)]


def test_monotonic_max_by_golden_deltas(spark):
    """The reference's monotonic_max_by unit test, key = value % 5
    (/root/reference/src/flow.rs:616-627, FIXTURES.md §1): exact delta
    vectors per batch, including retractions."""
    batches = [[1], [1], [11, 2], [6, 7]]
    expected = [
        [(1, 1)],
        [],
        [(1, -1), (2, 1), (11, 1)],
        [(2, -1), (7, 1)],
    ]
    seen: list[int] = []
    prev = None
    for batch, exp in zip(batches, expected):
        seen.extend(batch)
        cur = (
            Flow.source(_scalar(spark, seen))
            .monotonic_max_by(F.col("value") % 5, "value")
            .df
        )
        if prev is None:
            deltas = [(r["value"], 1) for r in cur.collect()]
        else:
            deltas = [(r["value"], r["delta"]) for r in snapshot_diff(prev, cur).collect()]
        assert sorted(deltas) == sorted(exp), f"batch {batch}"
        prev = cur


def test_monotonic_representative_golden_deltas(spark):
    """/root/reference/src/flow.rs:629-640: representative (first-seen,
    pinned to min) keyed on value % 5."""
    # reference: batch [1] -> [(1,+1)]; [6] -> [] (same key, rep stays)
    a = Flow.source(_scalar(spark, [1])).monotonic_representative_by(F.col("value") % 5, "value").df
    b = Flow.source(_scalar(spark, [1, 6])).monotonic_representative_by(F.col("value") % 5, "value").df
    assert rows(a) == [(1,)]
    assert [(r["value"], r["delta"]) for r in snapshot_diff(a, b).collect()] == []


def test_source_limited_lookback(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-06-01 00:00:00"), (3, "2024-06-10 00:00:00")],
        "id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    f = Flow.source_limited(df, "ts", "INTERVAL 30 DAYS")
    assert rows(f.df, "id") == [(2,), (3,)]


def test_threshold_delta_space_rewrites_net_multiplicity(spark):
    """U4 in delta space: multiplicity is the signed NET sum(delta) per
    record, consolidated first, rewritten back into the delta column
    (reference threshold_total semantics) — NOT physical-row count."""
    df = spark.createDataFrame(
        [(1, 5), (2, 1), (2, -1), (3, -2)], "value int, delta int"
    )
    # clip to at most 1 (distinct-like): net 5 -> 1, net 0 -> gone,
    # net -2 -> -2 (clip only caps positives)
    got = Flow(df).threshold(lambda m: F.least(m, F.lit(1)))
    assert sorted(tuple(r) for r in got.df.collect()) == [(1, 1), (3, -2)]


def test_count_values_delta_space_nets_out(spark):
    df = spark.createDataFrame(
        [(7, 1), (7, 1), (7, -1), (8, 1), (9, 1), (9, -1)], "value int, delta int"
    )
    got = Flow(df).count_values()
    # value 9 nets to zero and vanishes; outputs carry delta=1
    assert sorted(tuple(r) for r in got.df.collect()) == [(7, 1, 1), (8, 1, 1)]
    assert got.df.columns == ["value", "count", "delta"]


def test_monotonic_max_by_full_record_tiebreak(spark):
    """Two records sharing the max sort_key: winner is the full-record
    max (deterministic), matching the reference's Ord compare."""
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "z"), (1, 9, "m")], "k int, s int, payload string"
    )
    got = Flow(df).monotonic_max_by("k", "s").df.collect()
    assert [(r.k, r.s, r.payload) for r in got] == [(1, 10, "z")]


def test_delta_space_set_ops_cancel_retractions(spark):
    """distinct / except_all / intersect_all / Grouped.count over delta
    frames operate on NET multiplicities: a +1/−1 pair is a non-record."""
    from actyxos_data_flow_spark.flow import Flow
    from actyxos_data_flow_spark.grouped import Grouped

    d = spark.createDataFrame(
        [("a", 1), ("a", -1), ("b", 1), ("b", 1), ("c", 1)], "v string, delta long"
    )
    f = Flow.source(d)
    assert sorted(tuple(r) for r in f.distinct().df.collect()) == [("b", 1), ("c", 1)]

    other = Flow.source(spark.createDataFrame([("b", 1)], "v string, delta long"))
    assert sorted(tuple(r) for r in f.except_all(other).df.collect()) == [
        ("b", 1),
        ("c", 1),
    ]
    assert sorted(tuple(r) for r in f.intersect_all(other).df.collect()) == [("b", 1)]

    g = Grouped(d, ["v"])
    assert sorted(tuple(r) for r in g.count().df.collect()) == [("b", 2), ("c", 1)]
    # max_record must not resurrect the retracted 'a'
    recs = sorted(tuple(r) for r in Grouped(d, ["v"]).max_record().df.collect())
    assert [r[0] for r in recs] == ["b", "c"]


def test_iter_rows_duplicate_column_names_fall_back_to_dict_rows():
    """_iter_rows fast path (itertuples) silently renames DUPLICATE
    columns to positional _1/_2 under rename=True; duplicate-named
    frames must take the dict-backed path so attribute access and
    _asdict keys stay faithful (first-wins like pandas dict conversion)."""
    import pandas as pd

    from actyxos_data_flow_spark.flow import _iter_rows

    pdf = pd.DataFrame([[1, 2], [3, 4]], columns=["x", "x"])
    got = list(_iter_rows(pdf))
    # dict-backed rows: no positional _1/_2 fields fabricated
    assert all(set(r._asdict().keys()) == {"x"} for r in got)


def test_probe_blocks_until_epoch_complete(spark):
    """F9: the observation yields its metrics exactly when the action
    (epoch) finishes — the reference's probe.less_than() contract in
    Spark's Observation form."""
    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.flow import Flow

    df = spark.range(100).withColumnRenamed("id", "v")
    flow, obs = Flow.source(df).filter(F.col("v") % 2 == 0).probe(
        "epoch", F.count(F.lit(1)).alias("rows"), F.sum("v").alias("total")
    )
    flow.df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == 50 and got["total"] == sum(range(0, 100, 2))
