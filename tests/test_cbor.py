"""CBOR codec (sources/cbor.py): RFC 8949 public test vectors,
encode/decode roundtrips (hypothesis), malformed-input skipping, and
the Spark binary-payload decode path."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from actyxos_data_flow_spark.sources.cbor import (
    CBORError,
    cbor_dumps,
    cbor_loads,
    decode_cbor_payload,
)

# RFC 8949 Appendix A vectors (public spec examples)
VECTORS = [
    ("00", 0),
    ("01", 1),
    ("0a", 10),
    ("17", 23),
    ("1818", 24),
    ("1819", 25),
    ("1864", 100),
    ("1903e8", 1000),
    ("1a000f4240", 1000000),
    ("1b000000e8d4a51000", 1000000000000),
    ("20", -1),
    ("29", -10),
    ("3863", -100),
    ("3903e7", -1000),
    ("f4", False),
    ("f5", True),
    ("f6", None),
    ("f93c00", 1.0),
    ("fa47c35000", 100000.0),
    ("fb3ff199999999999a", 1.1),
    ("60", ""),
    ("6161", "a"),
    ("6449455446", "IETF"),
    ("62225c", '"\\'),
    ("4401020304", b"\x01\x02\x03\x04"),
    ("80", []),
    ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("a0", {}),
    ("a201020304", {1: 2, 3: 4}),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    # indefinite lengths
    ("7f657374726561646d696e67ff", "streaming"),
    ("5f42010243030405ff", b"\x01\x02\x03\x04\x05"),
    ("9fff", []),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    # tags are transparent (tag 1 = epoch seconds)
    ("c11a514b67b0", 1363896240),
]


@pytest.mark.parametrize("hex_in,expect", VECTORS, ids=[h for h, _ in VECTORS])
def test_rfc8949_vectors(hex_in, expect):
    got = cbor_loads(bytes.fromhex(hex_in))
    assert got == expect
    assert type(got) is type(expect) or isinstance(expect, (int, float))


def test_nonfinite_floats():
    assert math.isnan(cbor_loads(bytes.fromhex("f97e00")))
    assert cbor_loads(bytes.fromhex("f97c00")) == math.inf
    assert cbor_loads(bytes.fromhex("f9fc00")) == -math.inf


MALFORMED = [
    "",        # empty
    "18",      # truncated uint8 argument
    "1a0000",  # truncated uint32
    "62ff",    # truncated text body
    "63c328",  # invalid utf-8 (and truncated)
    "8301",    # truncated array
    "a161",    # truncated map key
    "5f00ff",  # non-string chunk in indefinite byte string
    "ff",      # lone break
    "1c",      # reserved additional info
    "0001",    # trailing bytes
    "7f61",    # unterminated indefinite string
    "a18001",  # array as map key: legal CBOR, unhashable in Python → CBORError
    "a1a001",  # map as map key: ditto (definite lengths)
    "bf8001ff",  # array as map key, indefinite-length map
]


@pytest.mark.parametrize("hex_in", MALFORMED)
def test_malformed_raises(hex_in):
    with pytest.raises(CBORError):
        cbor_loads(bytes.fromhex(hex_in))


json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=20,
)


@settings(max_examples=300, deadline=None)
@given(json_values)
def test_roundtrip(v):
    assert cbor_loads(cbor_dumps(v)) == v


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=30))
def test_arbitrary_bytes_never_crash(b):
    """Decoder must raise CBORError (the skip contract), never anything
    else, on arbitrary garbage."""
    try:
        cbor_loads(b)
    except CBORError:
        pass


def test_spark_decode_cbor_payload_skips_bad_rows(spark):
    """Binary-payload path: valid CBOR maps extract into the typed
    struct; truncated/garbage payloads are skipped, not fatal — the
    reference's runner.rs:180-196 contract."""
    rows = [
        (1, cbor_dumps({"k": 41, "s": "x"})),
        (2, cbor_dumps({"k": -7, "s": "y"})),
        (3, b"\x83\x01"),  # truncated array
        (4, None),
        (5, cbor_dumps({"s": "no-k"})),  # missing field -> NULL, kept
    ]
    df = spark.createDataFrame(rows, "id LONG, payload BINARY")
    out = decode_cbor_payload(df, "k INT, s STRING")
    got = {r["id"]: (r["payload"]["k"], r["payload"]["s"]) for r in out.collect()}
    assert got == {1: (41, "x"), 2: (-7, "y"), 5: (None, "no-k")}


def test_spark_cbor_matches_json_path(spark):
    """CBOR decode of a re-encoded JSON payload is value-identical to
    the JVM from_json path (the cbor_props_stats query's invariant)."""
    import json

    from actyxos_data_flow_spark.model import decode_payload

    payloads = ['{"k": 5}', '{"k": null}', '{"other": 1}', '{"k": -3}']
    jdf = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "id LONG, payload STRING")
    cdf = spark.createDataFrame(
        [(i, cbor_dumps(json.loads(p))) for i, p in enumerate(payloads)],
        "id LONG, payload BINARY",
    )
    jout = {r["id"]: r["payload"]["k"] for r in decode_payload(jdf, "k INT").collect()}
    cout = {r["id"]: r["payload"]["k"] for r in decode_cbor_payload(cdf, "k INT").collect()}
    assert jout == cout and len(jout) == 4


def test_degenerate_props_stay_counted(spark):
    """The cbor_props_stats extraction shape: NULL / non-object /
    unparseable props yield NULL k but the row STAYS (schema-on-read
    parity with from_json) — the count(*) oracle must hold under
    testdata drift."""
    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.sources.cbor import cbor_to_json, json_to_cbor

    rows = [(1, '{"k": 3}'), (2, None), (3, "[1,2]"), (4, "not json"), (5, '{"x": 1}')]
    df = spark.createDataFrame(rows, "id LONG, props STRING")
    out = df.withColumn("payload", json_to_cbor("props")).select(
        "id", F.from_json(cbor_to_json("payload"), "k INT").getField("k").alias("k")
    )
    got = {r["id"]: r["k"] for r in out.collect()}
    assert got == {1: 3, 2: None, 3: None, 4: None, 5: None}
