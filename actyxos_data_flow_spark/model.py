"""Data model: the event envelope, payload decoding, record structs.

Reference mapping (SURVEY.md §1):

- The reference's event envelope (``stream.name``, ``semantics``,
  ``lamport``, ``timestamp``, per-source ``offset``, typed ``payload``;
  fields used at /root/reference/examples/machine-dashboard/logic.rs:16-23,
  /root/reference/src/runner.rs:238-299) becomes a fixed Spark schema
  (:data:`ENVELOPE_SCHEMA`).
- Payloads are CBOR/JSON decoded via serde ``extract::<T>()``
  (/root/reference/src/machine.rs:71-75); here ``from_json`` with an
  explicit schema. Unparseable payloads are *skipped, not fatal*
  (/root/reference/src/runner.rs:180-196) — :func:`decode_payload` keeps a
  null-payload row out of the typed flow via an ``is_valid`` filter.
- Rust derives lexicographic ``Ord`` by field order; min/max/max_by over
  whole records depend on it (/root/reference/src/flow.rs:546-567).
  Spark struct comparison is likewise field-order lexicographic, so
  :func:`record_struct` pins the field order explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical envelope for an event-log source (SURVEY.md §1.2).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("stream_name", T.StringType(), False),
        T.StructField("semantics", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("lamport", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("payload", T.StringType(), True),  # JSON
    ]
)


def decode_payload(df: DataFrame, payload_schema: T.StructType | str, payload_col: str = "payload") -> DataFrame:
    """``from_json`` payload decode; drops unparseable events (counted as
    skipped in the reference, /root/reference/src/runner.rs:180-196).

    PERMISSIVE ``from_json`` yields an all-null struct (not a null) for
    malformed input, so the skip test rides on an explicit
    corrupt-record column instead of struct null-ness."""
    schema = (
        T._parse_datatype_string(payload_schema)
        if isinstance(payload_schema, str)
        else payload_schema
    )
    # fresh field list — .add() mutates in place, which would grow a
    # caller-owned schema on every call
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    decoded = df.withColumn(
        "_payload",
        F.from_json(
            F.col(payload_col), with_corrupt, {"columnNameOfCorruptRecord": "_corrupt"}
        ),
    )
    # NULL input produces a NULL struct with a NULL _corrupt marker, so
    # it must be excluded explicitly — a null-payload event is skipped
    # exactly like an unparseable one (the docstring's contract)
    return (
        decoded.filter(
            F.col(payload_col).isNotNull() & F.col("_payload._corrupt").isNull()
        )
        .drop(payload_col)
        .withColumn("payload", F.col("_payload").dropFields("_corrupt"))
        .drop("_payload")
    )


def record_struct(*cols: str | Column) -> Column:
    """A struct whose comparison order == declared field order, mirroring
    Rust's derived lexicographic Ord (used by G9/G10/G11 min/max/max_by)."""
    return F.struct(*cols)


def events_as_envelope(events: DataFrame) -> DataFrame:
    """Adapt the synthetic ``events`` table to the canonical envelope
    (mapping per FIXTURES.md §3: user_id→stream name, event_id→lamport)."""
    return events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("stream_name"),
        F.lit("eventFish").alias("semantics"),
        F.lit("src-0").alias("source"),
        F.col("event_id").alias("lamport"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.col("props").alias("payload"),
        F.col("event_type"),
        F.col("value"),
        F.col("user_id"),
    )
