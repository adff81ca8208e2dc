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
