"""PostgreSQL sink (K4): the DB-API core + Postgres dialect.

Mirrors the reference's Postgres driver
(/root/reference/src/db/postgre.rs:47-135 init/migration, :205-263
write, :160-171 NULL-safe compare). Differences from the reference,
both deliberate:

- delete-exactly-n is a single ctid-subquery ``DELETE ... WHERE ctid IN
  (SELECT ctid ... LIMIT n)`` instead of the reference's
  delete-all-then-re-insert compensation (postgre.rs:243-252) — same
  net rows, no re-insert churn;
- connection comes from psycopg (v3) or psycopg2, whichever is
  installed (import-gated: this container ships neither, so the class
  raises ImportError at construction; the dialect + algorithm are fully
  unit-tested without a server, and the env-gated round-trip test
  mirrors postgre.rs:301-342 / ``POSTGRES_CONNECT``).

At cluster scale the consolidated net delta is churn-sized (see
sinks/writer.py), so one driver-side connection is the reference's own
topology; for parallel apply, run the same ``advance_offsets`` batches
per-partition via foreachPartition with per-partition connections.
"""

from __future__ import annotations

from .dbapi import DbapiSink
from .dialect import PostgresDialect


def connect_postgres(conninfo: str):
    """A DB-API connection from whichever Postgres driver is available
    (psycopg v3, else psycopg2)."""
    try:
        import psycopg  # type: ignore[import-not-found]

        return psycopg.connect(conninfo)
    except ImportError:
        pass
    try:
        import psycopg2  # type: ignore[import-not-found]

        return psycopg2.connect(conninfo)
    except ImportError as e:
        raise ImportError(
            "PostgresSink needs psycopg (v3) or psycopg2; neither is installed"
        ) from e


class PostgresSink(DbapiSink):
    def __init__(self, conninfo: str, conn=None):
        """``conn``: bring-your-own DB-API connection (any object with
        cursor/commit/rollback/close) — the injection point for pools,
        wrappers, or alternative transports; default is whichever
        psycopg the environment ships."""
        super().__init__(
            conn if conn is not None else connect_postgres(conninfo), PostgresDialect()
        )
