"""Schema-drift regression: the events timestamp must survive ANY
upstream physical parquet type change.

Round 2 post-mortem: the driver regenerated ``events.parquet`` with
physical ``timestamp[us]`` (round 1 was INT64 TIMESTAMP(NANOS)) and a
loader pinned to the nanos assumption took down 7 queries and the whole
bench. This test writes a tiny events table in every physical form a
writer might plausibly produce and asserts the loader normalizes all of
them to the SAME canonical LONG-nanos column, so the bug class cannot
ship again (VERDICT r2 "Next round" #2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from actyxos_data_flow_spark.functions.scalar import ns_micros
from actyxos_data_flow_spark.sources.tables import load_table

# Sub-millisecond epoch-micros values (post-1970) so unit mistakes
# (ms-for-us, s-for-us, tz shifts) cannot cancel out.
MICROS = [
    1_705_321_496_789_123,  # 2024-01-15 12:24:56.789123
    1_705_321_497_000_001,
    1_999_999_999_999_999,
    1,
    0,
]


def _write_events(path, ts_type):
    n = len(MICROS)
    ts = pa.array(MICROS, pa.timestamp("us")).cast(
        ts_type, safe=False
    )  # ms target truncates sub-ms digits, mirrored in the test's expectation
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, str(path))
    return table


PHYSICAL_FORMS = {
    "int64_nanos": pa.timestamp("ns"),          # round-1 testdata form
    "micros_ntz": pa.timestamp("us"),           # round-2+ testdata form
    "micros_utc": pa.timestamp("us", tz="UTC"), # isAdjustedToUTC=true
    "millis_ntz": pa.timestamp("ms"),           # coarser writer
}


@pytest.mark.parametrize("form", sorted(PHYSICAL_FORMS))
def test_events_ts_normalized_across_physical_types(spark, tmp_path, form):
    sf_dir = tmp_path / form
    sf_dir.mkdir()
    _write_events(sf_dir / "events.parquet", PHYSICAL_FORMS[form])

    df = load_table(spark, str(sf_dir), "events")
    # Canonical in-engine form: LONG epoch-nanos, whatever was on disk.
    assert df.schema["ts"].dataType.typeName() == "long", df.schema["ts"].dataType

    got = {
        r["event_id"]: r["us"]
        for r in df.select("event_id", ns_micros("ts").alias("us")).collect()
    }
    expect = dict(enumerate(MICROS))
    if form == "millis_ntz":  # written at ms precision: sub-ms digits truncate
        expect = {k: (v // 1000) * 1000 for k, v in expect.items()}
    assert got == expect


def test_events_ts_independent_of_session_timezone(spark, tmp_path):
    """NTZ normalization must not depend on spark.sql.session.timeZone —
    a cluster in any timezone must agree with the UTC oracle."""
    sf_dir = tmp_path / "tzcheck"
    sf_dir.mkdir()
    _write_events(sf_dir / "events.parquet", pa.timestamp("us"))

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, str(sf_dir), "events")
        got = sorted(
            r["us"] for r in df.select(ns_micros("ts").alias("us")).collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert got == sorted(MICROS)
