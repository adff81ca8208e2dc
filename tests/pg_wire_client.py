"""Minimal PostgreSQL v3 wire-protocol DB-API client — TEST TRANSPORT ONLY.

This container ships a real PostgreSQL server (initdb/pg_ctl 15.x) but no
Python driver (psycopg/psycopg2/pg8000 all absent) and no JDBC jar, so the
env-gated sink round-trip (tests/test_sink_dialects.py, mirroring the
reference's POSTGRES_CONNECT harness at /root/reference/src/db/postgre.rs:301)
could never execute against a real server. This module closes that gap with
the smallest correct subset of the public frontend/backend protocol
(https://www.postgresql.org/docs/current/protocol.html):

- StartupMessage + trust auth (local unix socket);
- every statement via the EXTENDED protocol (Parse/Bind/Describe/Execute/
  Sync) with text-format parameters, so the sink's ``%s`` placeholders are
  converted to ``$n`` and bound server-side exactly like psycopg does — the
  NULL-safe / delete-exactly-n SQL is exercised verbatim, not interpolated;
- DB-API transaction demarcation: implicit BEGIN before the first statement,
  explicit COMMIT/ROLLBACK, matching what DbapiSink._txn expects.

Deliberately NOT a general driver: text format only, a small oid→decoder
map, no TLS/SCRAM/COPY/pipelining. Do not ship this outside tests/.
"""

from __future__ import annotations

import socket
import struct


class PgError(Exception):
    """Server ErrorResponse, carrying sqlstate + message."""

    def __init__(self, fields: dict[str, str]):
        self.sqlstate = fields.get("C", "")
        super().__init__(f"{fields.get('S', 'ERROR')} {self.sqlstate}: {fields.get('M', '')}")


def _decode(oid: int, raw: bytes):
    s = raw.decode("utf-8")
    if oid in (20, 21, 23, 26):  # int8/int2/int4/oid
        return int(s)
    if oid == 16:  # bool
        return s == "t"
    if oid in (700, 701):  # float4/float8
        return float(s)
    if oid == 1700:  # numeric
        return int(s) if "." not in s and "e" not in s.lower() else float(s)
    return s


def _encode(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, (bytes, bytearray)):  # bytea text format
        return b"\\x" + bytes(v).hex().encode()
    return str(v).encode("utf-8")


def _pct_to_dollar(sql: str) -> str:
    """%s (DB-API format style) -> $1..$n; %% -> literal %."""
    out, n, i = [], 0, 0
    while i < len(sql):
        c = sql[i]
        if c == "%" and i + 1 < len(sql):
            nxt = sql[i + 1]
            if nxt == "s":
                n += 1
                out.append(f"${n}")
                i += 2
                continue
            if nxt == "%":
                out.append("%")
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


class Cursor:
    def __init__(self, conn: "Connection"):
        self._conn = conn
        self.description = None
        self.rowcount = -1
        self._rows: list[tuple] = []
        self._pos = 0

    def execute(self, sql: str, params=()):
        self.description, self._rows, self._pos, self.rowcount = self._conn._run(
            sql, tuple(params or ())
        )
        return self

    def executemany(self, sql: str, seq):
        for p in seq:
            self.execute(sql, p)
        return self

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchall(self):
        rows = self._rows[self._pos :]
        self._pos = len(self._rows)
        return rows

    def close(self):
        self._rows = []


class Connection:
    """DB-API-ish connection over a unix socket with trust auth."""

    def __init__(self, host: str, port: int = 5432, user: str = "pg", dbname: str = "postgres"):
        path = f"{host}/.s.PGSQL.{port}" if host.startswith("/") else None
        if path is None:
            self._sock = socket.create_connection((host, port))
        else:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(path)
        self._buf = b""
        self._txn = "I"  # ReadyForQuery status: I idle, T in txn, E failed
        params = f"user\0{user}\0database\0{dbname}\0\0".encode()
        pkt = struct.pack("!ii", 8 + len(params), 196608) + params
        self._sock.sendall(pkt)
        for typ, payload in self._until_ready():
            if typ == b"R" and struct.unpack("!i", payload[:4])[0] != 0:
                raise PgError({"M": "only trust auth is supported", "S": "FATAL"})

    # -- wire helpers -----------------------------------------------------
    def _recv_msg(self):
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError({"M": "connection closed", "S": "FATAL"})
            self._buf += chunk
        typ, ln = self._buf[:1], struct.unpack("!i", self._buf[1:5])[0]
        while len(self._buf) < 1 + ln:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError({"M": "connection closed", "S": "FATAL"})
            self._buf += chunk
        payload = self._buf[5 : 1 + ln]
        self._buf = self._buf[1 + ln :]
        return typ, payload

    def _until_ready(self):
        """Yield messages until ReadyForQuery, tracking txn status."""
        while True:
            typ, payload = self._recv_msg()
            if typ == b"Z":
                self._txn = payload.decode()
                return
            yield typ, payload

    @staticmethod
    def _err_fields(payload: bytes) -> dict[str, str]:
        fields = {}
        for part in payload.split(b"\0"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return fields

    def _simple(self, sql: str):
        b = sql.encode() + b"\0"
        self._sock.sendall(b"Q" + struct.pack("!i", 4 + len(b)) + b)
        err = None
        for typ, payload in self._until_ready():
            if typ == b"E":
                err = PgError(self._err_fields(payload))
        if err:
            raise err

    def _run(self, sql: str, params: tuple):
        if self._txn == "I":
            self._simple("BEGIN")
        q = _pct_to_dollar(sql).encode() + b"\0"
        parse = b"\0" + q + struct.pack("!h", 0)  # unnamed stmt, no type hints
        vals = [_encode(v) for v in params]
        bind = b"\0\0" + struct.pack("!h", 0)  # unnamed portal+stmt, text params
        bind += struct.pack("!h", len(vals))
        for v in vals:
            bind += struct.pack("!i", -1) if v is None else struct.pack("!i", len(v)) + v
        bind += struct.pack("!h", 0)  # text results
        describe = b"P\0"
        execute = b"\0" + struct.pack("!i", 0)
        msg = (
            b"P" + struct.pack("!i", 4 + len(parse)) + parse
            + b"B" + struct.pack("!i", 4 + len(bind)) + bind
            + b"D" + struct.pack("!i", 4 + len(describe)) + describe
            + b"E" + struct.pack("!i", 4 + len(execute)) + execute
            + b"S" + struct.pack("!i", 4)
        )
        self._sock.sendall(msg)
        desc, rows, rowcount, err = None, [], -1, None
        for typ, payload in self._until_ready():
            if typ == b"T":
                nf = struct.unpack("!h", payload[:2])[0]
                off, desc = 2, []
                for _ in range(nf):
                    end = payload.index(b"\0", off)
                    name = payload[off:end].decode()
                    off = end + 1
                    (_tab, _col, oid, _tl, _tm, _fmt) = struct.unpack(
                        "!ihihih", payload[off : off + 18]
                    )
                    off += 18
                    desc.append((name, oid, None, None, None, None, None))
            elif typ == b"D":
                nf = struct.unpack("!h", payload[:2])[0]
                off, row = 2, []
                for j in range(nf):
                    (ln,) = struct.unpack("!i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(_decode(desc[j][1], payload[off : off + ln]))
                        off += ln
                rows.append(tuple(row))
            elif typ == b"C":
                tag = payload.rstrip(b"\0").decode().split()
                if tag and tag[-1].isdigit():
                    rowcount = int(tag[-1])
            elif typ == b"E":
                err = PgError(self._err_fields(payload))
        if err:
            raise err
        return desc, rows, 0, rowcount

    # -- DB-API surface ----------------------------------------------------
    def cursor(self) -> Cursor:
        return Cursor(self)

    def commit(self):
        if self._txn != "I":
            self._simple("COMMIT")

    def rollback(self):
        if self._txn != "I":
            self._simple("ROLLBACK")

    def close(self):
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))
        finally:
            self._sock.close()


def connect(conninfo: str) -> Connection:
    """Parse a libpq-style keyword conninfo ('host=/dir port=5432
    user=pg dbname=postgres') and connect."""
    kv = dict(part.split("=", 1) for part in conninfo.split())
    return Connection(
        host=kv.get("host", "/tmp"),
        port=int(kv.get("port", "5432")),
        user=kv.get("user", "pg"),
        dbname=kv.get("dbname", kv.get("database", "postgres")),
    )
