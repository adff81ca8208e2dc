"""As-of and interval join operators (operators/temporal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from actyxos_data_flow_spark.operators import temporal as TJ
from tests.conftest import rows


def _frames(spark):
    build = spark.createDataFrame(
        [(1, 10, 1, 100), (1, 20, 2, 200), (1, 20, 3, 300), (2, 5, 4, 400)],
        "k long, ts long, event_id long, payload long",
    )
    probe = spark.createDataFrame(
        [(1, 15, 10, 1.0), (1, 20, 11, 2.0), (1, 25, 12, 3.0), (2, 1, 13, 4.0), (3, 9, 14, 5.0)],
        "k long, ts long, event_id long, v double",
    )
    return probe, build


def test_asof_join_backward_inclusive_and_ties(spark):
    probe, build = _frames(spark)
    got = rows(TJ.asof_join(probe, build, ["k"], "ts", "event_id"), "event_id", "payload")
    # 10: ts15 -> build ts10 (100); 11: ts20 ties -> max event_id build row (300)
    # 12: ts25 -> latest is ts20/id3 (300); 13: nothing precedes -> null; 14: no key -> null
    assert got == [(10, 100), (11, 300), (12, 300), (13, None), (14, None)]


def test_asof_join_rejects_colliding_payload(spark):
    probe, build = _frames(spark)
    with pytest.raises(ValueError, match="colliding"):
        TJ.asof_join(probe, build.withColumnRenamed("payload", "v"), ["k"], "ts", "event_id")


def test_interval_join_bucketed_matches_plain(spark):
    points = spark.createDataFrame(
        [(1, t, 100 + t) for t in (0, 5, 10, 29, 30, 31, 59, 60, 95)],
        "k long, ts long, pid long",
    )
    ranges = spark.createDataFrame(
        [(1, 0, 30, 1), (1, 25, 65, 2), (1, 90, 100, 3), (2, 0, 100, 4)],
        "k long, s long, e long, rid long",
    )
    plain = TJ.interval_join(points, ranges, ["k"], "ts", "s", "e")
    bucketed = TJ.interval_join(points, ranges, ["k"], "ts", "s", "e", bucket_width=30)
    assert rows(plain, "pid", "rid") == rows(bucketed, "pid", "rid")
    # boundary semantics: start inclusive, end exclusive
    got = rows(bucketed, "pid", "rid")
    assert (130, 1) not in got and (130, 2) in got  # ts=30: range 1 ended, range 2 covers
    assert (100, 1) in got  # ts=0 == start: included


def test_interval_join_exact_at_epoch_scale_boundaries(spark):
    """Bucket ids must come from integer division: at epoch-microsecond
    magnitudes a float-divided point on an exact bucket boundary can
    round into the wrong bucket and lose its matches."""
    width = 1_800_000_000  # 30 min in micros
    base = 1_704_067_200_000_000  # 2024-01-01 epoch micros (multiple of width? not required)
    # points exactly on, just below, and just above a bucket boundary
    boundary = (base // width + 7) * width
    points = spark.createDataFrame(
        [(1, boundary - 1, 1), (1, boundary, 2), (1, boundary + 1, 3)],
        "k long, ts long, pid long",
    )
    ranges = spark.createDataFrame(
        [(1, boundary - width, boundary, 10), (1, boundary, boundary + width, 11)],
        "k long, s long, e long, rid long",
    )
    got = rows(
        TJ.interval_join(points, ranges, ["k"], "ts", "s", "e", bucket_width=width),
        "pid", "rid",
    )
    # end-exclusive: pid 1 -> range 10 only; pid 2,3 -> range 11 only
    assert got == [(1, 10), (2, 11), (3, 11)]


def test_rolling_agg_range_frame_semantics(spark):
    """Frame membership is by timestamp VALUE: the two rows at t=100
    share the identical frame (and result); t=5000 is outside the
    1000-micro lookback of nothing — frame is itself only."""
    from actyxos_data_flow_spark.operators import temporal as TJ

    ev = spark.createDataFrame(
        [
            (1, "u", 100, 10.0),
            (2, "u", 100, 20.0),
            (3, "u", 900, 30.0),
            (4, "u", 5000, 40.0),
        ],
        "event_id long, user_id string, ts_micros long, value double",
    )
    got = {r.event_id: (r.rolling_cnt, r.rolling_avg) for r in TJ.rolling_agg(ev, lookback_micros=1000).collect()}
    assert got[1] == (2, 15.0) and got[2] == (2, 15.0)  # same frame
    assert got[3] == (3, 20.0)
    assert got[4] == (1, 40.0)


def test_scd2_intervals_tile_and_tail_open(spark):
    from actyxos_data_flow_spark.operators import temporal as TJ

    ev = spark.createDataFrame(
        [(10, "u", 100, 1.0), (11, "u", 200, 2.0), (12, "v", 50, 9.0)],
        "event_id long, user_id string, ts_micros long, value double",
    )
    got = sorted(
        ((r.user_id, r.valid_from, r.valid_to, r.is_current) for r in TJ.scd2(ev).collect())
    )
    assert got == [("u", 100, 200, False), ("u", 200, None, True), ("v", 50, None, True)]
