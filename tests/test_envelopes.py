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


def _kafka_frame(spark, values):
    """Synthesize the Kafka connector's wire shape (value = JSON bytes)."""
    from actyxos_data_flow_spark.sources.envelopes import KAFKA_WIRE_SCHEMA

    rows = [
        (None, v.encode(), "events", i % 2, i, None, 0) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_kafka_envelopes_decode_and_filter(spark):
    from actyxos_data_flow_spark.sources.envelopes import kafka_envelopes

    good = dict(stream_name="m-1", semantics="machineFish", source="src-a",
                lamport=1, offset=10, timestamp="2024-01-01T00:00:00.000Z",
                payload=json.dumps({"n": 1}))
    other = dict(good, semantics="userFish", lamport=2, offset=11)
    frame = _kafka_frame(spark, [json.dumps(good), json.dumps(other), "NOT JSON {"])
    out = kafka_envelopes(frame)
    assert out.count() == 2  # malformed value skipped, not fatal
    got = kafka_envelopes(frame, subs=[("machineFish", None, None)]).collect()
    assert len(got) == 1 and got[0].lamport == 1
    # envelope offset and broker offset both survive, under distinct names
    assert got[0].offset == 10 and got[0].kafka_offset == 0
    assert got[0].kafka_partition == 0


def test_kafka_envelopes_streaming_shape(spark, tmp_path):
    """The decode is stateless column work: the same function applies to
    a streaming frame (rate source -> wire-shaped cast) untouched."""
    import pyspark.sql.functions as F
    from actyxos_data_flow_spark.sources.envelopes import kafka_envelopes

    raw = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.to_json(F.struct(
                F.lit("m-1").alias("stream_name"),
                F.lit("machineFish").alias("semantics"),
                F.lit("src-a").alias("source"),
                F.col("value").alias("lamport"),
                F.col("value").alias("offset"),
                F.col("timestamp").alias("timestamp"),
                F.lit("{}").alias("payload"),
            )).cast("binary").alias("value"),
            F.lit("events").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("value").alias("offset"),
            F.col("timestamp").alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
    )
    out = kafka_envelopes(raw, subs=[("machineFish", None, None)])
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("kafka_shape_t").trigger(availableNow=True).start()
    q.awaitTermination(60)
    assert {f.name for f in out.schema.fields} >= {"stream_name", "lamport", "kafka_offset"}


def test_inspect_triples_delivers_bounded_sample(spark):
    from actyxos_data_flow_spark.flow import Flow

    df = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a int, delta int")
    seen = []
    f = Flow(df)
    out = f.inspect_triples(lambda d, t, m: seen.append((d["a"], t, m)), limit=2)
    assert out is f and len(seen) == 2
    assert all(m in (2, 4, 6) for _, _, m in seen)  # delta rides the mult slot


def test_decode_payload_skips_null_payload(spark):
    """NULL payloads are skipped exactly like unparseable ones (the
    documented contract; from_json(NULL) previously leaked through the
    corrupt filter as a NULL struct)."""
    from actyxos_data_flow_spark.model import decode_payload

    df = spark.createDataFrame(
        [(1, '{"k": 1}'), (2, None), (3, "not json")], "id long, payload string"
    )
    out = decode_payload(df, "k INT")
    assert [r["id"] for r in out.collect()] == [1]
