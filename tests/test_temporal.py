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
