"""JSONL envelope source + subscription filters (S5's wire format:
/root/reference/src/runner.rs:174-175, 238-245, 326-331)."""

from __future__ import annotations

import json

from actyxos_data_flow_spark.model import decode_payload
from actyxos_data_flow_spark.sources import read_envelopes, stream_envelopes


def _write_log(tmp_path):
    rows = [
        dict(stream_name="m-1", semantics="machineFish", source="src-a",
             lamport=1, offset=0, timestamp="2024-01-01T00:00:00.000Z",
             payload=json.dumps({"state": "working", "n": 1})),
        dict(stream_name="m-2", semantics="machineFish", source="src-b",
             lamport=2, offset=0, timestamp="2024-01-01T00:00:01.000Z",
             payload=json.dumps({"state": "idle", "n": 2})),
        dict(stream_name="u-1", semantics="userFish", source="src-a",
             lamport=3, offset=1, timestamp="2024-01-01T00:00:02.000Z",
             payload=json.dumps({"state": "x", "n": 3})),
        dict(stream_name="m-1", semantics="machineFish", source="src-a",
             lamport=4, offset=2, timestamp="2024-01-01T00:00:03.000Z",
             payload="{broken json"),  # well-formed envelope, bad payload
    ]
    p = tmp_path / "log"
    p.mkdir()
    with open(p / "part-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("THIS IS NOT JSON AT ALL\n")  # malformed line: dropped
    return str(p)


def test_subscription_wildcards_and_filters(spark, tmp_path):
    path = _write_log(tmp_path)
    # wildcard: all well-formed envelopes (malformed line dropped)
    assert read_envelopes(spark, path).count() == 4
    # semantics wildcard subscription (the reference's common form)
    machine = read_envelopes(spark, path, [("machineFish", None, None)])
    assert sorted(r.lamport for r in machine.collect()) == [1, 2, 4]
    # conjunctive triple + OR of two subscriptions
    both = read_envelopes(
        spark, path, [("machineFish", None, "src-b"), ("userFish", None, None)]
    )
    assert sorted(r.lamport for r in both.collect()) == [2, 3]


def test_payload_decode_skips_unparseable(spark, tmp_path):
    path = _write_log(tmp_path)
    env = read_envelopes(spark, path, [("machineFish", None, None)])
    typed = decode_payload(env, "state string, n long")
    got = {r.lamport: (r.payload.state, r.payload.n) for r in typed.collect()}
    # lamport 4 had an unparseable payload: skipped, not fatal
    assert got == {1: ("working", 1), 2: ("idle", 2)}


def test_stream_envelopes_same_shape(spark, tmp_path):
    path = _write_log(tmp_path)
    s = stream_envelopes(spark, path, [("machineFish", None, None)])
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == [
        "stream_name", "semantics", "source", "lamport", "offset", "timestamp", "payload",
    ]
