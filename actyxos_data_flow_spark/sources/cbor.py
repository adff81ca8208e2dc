"""CBOR payload codec (RFC 8949) + the Spark decode surface.

The reference consumes event payloads as CBOR/JSON ``Payload`` values
decoded via serde (``/root/reference/src/machine.rs:71-75``: a payload
is a CBOR-encoded JSON-like value, extracted into a typed struct, with
undecodable events skipped, not fatal —
``/root/reference/src/runner.rs:180-196``). The engine's JSON path is
``model.decode_payload`` (``from_json``); this module supplies the CBOR
counterpart.

The container ships no CBOR library, so the codec is a self-contained
implementation of the public RFC 8949 wire format — the subset a
JSON-like payload uses: ints, floats (16/32/64-bit), text/byte strings,
arrays, maps, bool/null, tags (ignored), definite and indefinite
lengths.

Spark surface: :func:`cbor_to_json` is an Arrow-batched pandas UDF
(binary → JSON string); :func:`decode_cbor_payload` composes it with
``model.decode_payload`` so the typed-struct extraction, corrupt-row
skipping, and schema handling stay in ONE place. The per-row Python
cost is inherent — CBOR is a recursive varlength format with no
columnar decode — but it runs batched over Arrow buffers and the blobs
never shuffle: decode happens in the scan stage.
"""

from __future__ import annotations

import base64
import json
import math
import struct
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# decoder


class CBORError(ValueError):
    pass


_BREAK = object()


def _map_put(m: dict, k: Any, v: Any) -> None:
    """RFC 8949 allows array/map keys, which are unhashable in Python; a
    TypeError here must surface as CBORError so the UDF skip-not-fatal
    contract (mirroring runner.rs:180-196) turns the row into NULL
    instead of failing the Spark task."""
    try:
        m[k] = v
    except TypeError as ex:
        raise CBORError(f"unhashable map key type {type(k).__name__}") from ex


def _read_uint(buf: bytes, i: int, ai: int) -> tuple[int, int]:
    """Value of the additional-info field: immediate or 1/2/4/8 bytes."""
    if ai < 24:
        return ai, i
    if ai == 24:
        if i + 1 > len(buf):
            raise CBORError("truncated uint8")
        return buf[i], i + 1
    if ai == 25:
        if i + 2 > len(buf):
            raise CBORError("truncated uint16")
        return int.from_bytes(buf[i : i + 2], "big"), i + 2
    if ai == 26:
        if i + 4 > len(buf):
            raise CBORError("truncated uint32")
        return int.from_bytes(buf[i : i + 4], "big"), i + 4
    if ai == 27:
        if i + 8 > len(buf):
            raise CBORError("truncated uint64")
        return int.from_bytes(buf[i : i + 8], "big"), i + 8
    raise CBORError(f"reserved additional info {ai}")


def _decode_item(buf: bytes, i: int) -> tuple[Any, int]:
    if i >= len(buf):
        raise CBORError("truncated item")
    ib = buf[i]
    i += 1
    major, ai = ib >> 5, ib & 0x1F

    if major == 0:  # unsigned int
        return _read_uint(buf, i, ai)
    if major == 1:  # negative int
        v, i = _read_uint(buf, i, ai)
        return -1 - v, i
    if major == 2 or major == 3:  # byte / text string
        if ai == 31:  # indefinite: chunks until break
            chunks = []
            while True:
                if i >= len(buf):
                    raise CBORError("unterminated indefinite string")
                if buf[i] == 0xFF:
                    i += 1
                    break
                if (buf[i] >> 5) != major or (buf[i] & 0x1F) == 31:
                    raise CBORError("bad chunk in indefinite string")
                c, i = _decode_item(buf, i)
                chunks.append(c)
            if major == 2:
                return b"".join(chunks), i
            return "".join(chunks), i
        n, i = _read_uint(buf, i, ai)
        if i + n > len(buf):
            raise CBORError("truncated string body")
        body = buf[i : i + n]
        i += n
        if major == 2:
            return bytes(body), i
        try:
            return body.decode("utf-8"), i
        except UnicodeDecodeError as ex:
            raise CBORError("invalid utf-8 in text string") from ex
    if major == 4:  # array
        out = []
        if ai == 31:
            while True:
                if i >= len(buf):
                    raise CBORError("unterminated indefinite array")
                if buf[i] == 0xFF:
                    return out, i + 1
                v, i = _decode_item(buf, i)
                out.append(v)
        n, i = _read_uint(buf, i, ai)
        for _ in range(n):
            v, i = _decode_item(buf, i)
            out.append(v)
        return out, i
    if major == 5:  # map
        m: dict[Any, Any] = {}
        if ai == 31:
            while True:
                if i >= len(buf):
                    raise CBORError("unterminated indefinite map")
                if buf[i] == 0xFF:
                    return m, i + 1
                k, i = _decode_item(buf, i)
                v, i = _decode_item(buf, i)
                _map_put(m, k, v)
        n, i = _read_uint(buf, i, ai)
        for _ in range(n):
            k, i = _decode_item(buf, i)
            v, i = _decode_item(buf, i)
            _map_put(m, k, v)
        return m, i
    if major == 6:  # tag: decode and discard the tag number
        _tag, i = _read_uint(buf, i, ai)
        return _decode_item(buf, i)
    # major 7: simple values / floats
    if ai == 20:
        return False, i
    if ai == 21:
        return True, i
    if ai == 22 or ai == 23:  # null / undefined
        return None, i
    if ai == 24:  # simple value, one byte
        if i + 1 > len(buf):
            raise CBORError("truncated simple value")
        return None, i + 1  # unassigned simples → null (JSON bridge)
    if ai == 25:
        if i + 2 > len(buf):
            raise CBORError("truncated float16")
        return struct.unpack(">e", buf[i : i + 2])[0], i + 2
    if ai == 26:
        if i + 4 > len(buf):
            raise CBORError("truncated float32")
        return struct.unpack(">f", buf[i : i + 4])[0], i + 4
    if ai == 27:
        if i + 8 > len(buf):
            raise CBORError("truncated float64")
        return struct.unpack(">d", buf[i : i + 8])[0], i + 8
    if ai == 31:
        raise CBORError("unexpected break")
    raise CBORError(f"unsupported simple value ai={ai}")


def cbor_loads(data: bytes) -> Any:
    """Decode one CBOR item; trailing bytes are an error (an event
    payload is exactly one value)."""
    v, i = _decode_item(bytes(data), 0)
    if i != len(data):
        raise CBORError(f"{len(data) - i} trailing bytes")
    return v


# ---------------------------------------------------------------------------
# encoder (tests + the JSON→CBOR shim; minimal-length heads)


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    for ai, size in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if n < (1 << (8 * size)):
            return bytes([(major << 5) | ai]) + n.to_bytes(size, "big")
    raise CBORError("length too large")


def cbor_dumps(obj: Any) -> bytes:
    if obj is False:
        return b"\xf4"
    if obj is True:
        return b"\xf5"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        return _head(0, obj) if obj >= 0 else _head(1, -1 - obj)
    if isinstance(obj, float):
        return b"\xfb" + struct.pack(">d", obj)
    if isinstance(obj, bytes):
        return _head(2, len(obj)) + obj
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return _head(3, len(b)) + b
    if isinstance(obj, (list, tuple)):
        return _head(4, len(obj)) + b"".join(cbor_dumps(v) for v in obj)
    if isinstance(obj, dict):
        return _head(5, len(obj)) + b"".join(
            cbor_dumps(k) + cbor_dumps(v) for k, v in obj.items()
        )
    raise CBORError(f"unencodable type {type(obj).__name__}")


# ---------------------------------------------------------------------------
# JSON bridge + Spark surface


def _jsonable(v: Any) -> Any:
    """CBOR value → JSON-compatible value (bytes → base64 text, the
    standard RFC 8949 §6.1 suggestion; non-finite floats → null)."""
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, float) and not math.isfinite(v):
        return None
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return v


def cbor_to_json(col: Column | str) -> Column:
    """BINARY CBOR column → JSON string column (Arrow-batched pandas
    UDF). Undecodable payloads become NULL — the skip contract."""

    @F.pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            if b is None:
                out.append(None)
                continue
            try:
                out.append(json.dumps(_jsonable(cbor_loads(b)), separators=(",", ":")))
            except (CBORError, ValueError, RecursionError):
                out.append(None)
        return pd.Series(out, dtype="object")

    return _decode(F.col(col) if isinstance(col, str) else col)


def json_to_cbor(col: Column | str) -> Column:
    """JSON string column → BINARY CBOR column (Arrow-batched pandas
    UDF) — the test/shim direction, used to exercise the binary-payload
    path against JSON fixtures. Unparseable JSON → NULL."""

    @F.pandas_udf(T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        out = []
        for j in s:
            if j is None:
                out.append(None)
                continue
            try:
                out.append(cbor_dumps(json.loads(j)))
            except (ValueError, CBORError, RecursionError):
                out.append(None)
        return pd.Series(out, dtype="object")

    return _encode(F.col(col) if isinstance(col, str) else col)


def decode_cbor_payload(
    df: DataFrame, payload_schema: T.StructType | str, payload_col: str = "payload"
) -> DataFrame:
    """CBOR twin of ``model.decode_payload``: binary CBOR → typed
    payload struct, undecodable events dropped. Decode runs in the scan
    stage (no shuffle of blobs); the struct extraction reuses the JSON
    path so both formats share one skip/corrupt contract."""
    from ..model import decode_payload

    j = df.withColumn(payload_col, cbor_to_json(payload_col))
    # cbor_to_json yields NULL for undecodable blobs; from_json treats
    # NULL input as a NULL row, which decode_payload's corrupt filter
    # keeps (NULL _corrupt) — so drop them explicitly first.
    return decode_payload(j.filter(F.col(payload_col).isNotNull()), payload_schema, payload_col)
