"""Event-envelope sources: JSON-lines event logs + subscription filters.

The reference consumes the ActyxOS Event Service: JSON event envelopes
selected by a list of ``Subscription`` triples (semantics, stream name,
source — each optionally wildcarded; ``Subscription::wildcard(
semantics)`` at /root/reference/src/runner.rs:24, filter applied
server-side per /root/reference/src/runner.rs:174-175, 238-245) and
delivered in Lamport order (``Order::Lamport``).

Spark-first mapping: the log is a JSONL directory (what an event-log
export / Kafka-connect dump looks like); the subscription triple becomes
a pushed-down disjunction of conjunctive filters on the envelope
columns, and Lamport order is an ``orderBy`` the consumer applies only
where an operator needs it (monotonic folds) — batch aggregates don't.
Both batch and streaming reads share :data:`model.ENVELOPE_SCHEMA`, so
the replay → catch-up → live phases all see one shape.

Malformed lines follow the reference's skip-not-fatal rule
(/root/reference/src/runner.rs:180-196): DROPMALFORMED at the reader for
broken JSON, and :func:`model.decode_payload` for well-formed envelopes
whose payload doesn't parse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import ENVELOPE_SCHEMA

#: (semantics, stream_name, source) — None = wildcard, like the
#: reference's Subscription fields.
Subscription = tuple[str | None, str | None, str | None]


def subscription_filter(subs: Sequence[Subscription]) -> Column:
    """OR of per-subscription conjunctions; a triple of Nones (or an
    empty list) selects everything. Plain column equality, so Catalyst
    pushes it into the scan."""
    terms: list[Column] = []
    for semantics, stream_name, source in subs:
        term = F.lit(True)
        if semantics is not None:
            term = term & (F.col("semantics") == semantics)
        if stream_name is not None:
            term = term & (F.col("stream_name") == stream_name)
        if source is not None:
            term = term & (F.col("source") == source)
        terms.append(term)
    if not terms:
        return F.lit(True)
    out = terms[0]
    for t in terms[1:]:
        out = out | t
    return out


def read_envelopes(
    spark: SparkSession, path: str, subs: Sequence[Subscription] = ()
) -> DataFrame:
    """Batch read of a JSONL envelope log (the replay/catch-up phases:
    ``query_between`` — /root/reference/src/runner.rs:238-245)."""
    df = (
        spark.read.schema(ENVELOPE_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    return df.filter(subscription_filter(subs))


def stream_envelopes(
    spark: SparkSession,
    path: str,
    subs: Sequence[Subscription] = (),
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming read of the same log layout (the live phase:
    ``subscribe_from(present)`` — /root/reference/src/runner.rs:326-331)."""
    df = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
    return df.filter(subscription_filter(subs))


# -- Kafka-shaped source -----------------------------------------------------
#
# The wire shape of `spark.read[Stream].format("kafka")`: the envelope
# arrives as JSON bytes in `value`, plus broker metadata. The decode is
# pure column work, so it applies identically to a real Kafka frame and
# to a synthesized one (how tests drive it — the Kafka connector JAR is
# not in this container).

#: Columns the Spark Kafka connector produces.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_envelopes(kafka_df: DataFrame, subs: Sequence[Subscription] = ()) -> DataFrame:
    """Decode Kafka records whose ``value`` is a JSON envelope into
    :data:`model.ENVELOPE_SCHEMA` rows (+ the broker offset as
    ``kafka_partition``/``kafka_offset`` for exactly-once bookkeeping).

    Malformed values follow the skip-not-fatal rule: detected via an
    explicit corrupt-record column (Spark 4 PERMISSIVE ``from_json``
    returns an all-null struct, never null, for broken JSON) and
    filtered. Works on batch and streaming frames alike — the transform
    is stateless column work."""
    from pyspark.sql import types as T

    # build a fresh field list: StructType holds the list by reference,
    # so .add() on a shared list would grow ENVELOPE_SCHEMA itself
    with_corrupt = T.StructType(
        list(ENVELOPE_SCHEMA.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    env = F.from_json(
        F.col("value").cast("string"), with_corrupt, {"columnNameOfCorruptRecord": "_corrupt"}
    )
    decoded = (
        kafka_df.withColumn("_env", env)
        .filter(F.col("_env._corrupt").isNull())
        .select(
            F.col("_env.stream_name").alias("stream_name"),
            F.col("_env.semantics").alias("semantics"),
            F.col("_env.source").alias("source"),
            F.col("_env.lamport").alias("lamport"),
            F.col("_env.offset").alias("offset"),
            F.col("_env.timestamp").alias("timestamp"),
            F.col("_env.payload").alias("payload"),
            F.col("partition").alias("kafka_partition"),
            F.col("offset").alias("kafka_offset"),
        )
    )
    return decoded.filter(subscription_filter(subs))


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    subs: Sequence[Subscription] = (),
    streaming: bool = True,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production entry for a Kafka-backed event log: requires the
    ``spark-sql-kafka`` connector on the classpath (absent here — the
    ``.load()`` raises in this container; :func:`kafka_envelopes` holds
    all engine logic and is what the tests exercise)."""
    reader = spark.readStream if streaming else spark.read
    raw = (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_envelopes(raw, subs)
