"""Dependency-free media codecs: WAV (RIFF PCM), BMP (BITMAPINFOHEADER),
PNG (zlib + the five scanline filters).

These are real wire-format implementations of the three public formats
whose specs are fully expressible with the stdlib (``struct``, ``zlib``,
``wave``) — no PIL/libav in this container, and none needed:

- WAV: RIFF/WAVE chunk walk, PCM (format tag 1) only, 8-bit unsigned or
  16-bit signed little-endian samples. The ENCODER uses the stdlib
  ``wave`` module and the DECODER is an independent struct parser, so
  every round-trip in tests crosses two implementations.
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER; 8-bit paletted (decoded
  through the palette) and 24-bit BGR (decoded to Rec.601 integer
  luminance); bottom-up and top-down row order; 4-byte row padding.
- PNG: signature + chunk CRCs (``zlib.crc32``), IHDR/IDAT/IEND, bit
  depth 8, color types 0 (grayscale) and 2 (RGB → Rec.601 luminance),
  full filter reconstruction (None/Sub/Up/Average/Paeth, PNG spec §9).
  Interlacing (Adam7) is rejected, not silently mangled.

All decoders raise :class:`CodecError` on malformed input — the skip-
not-fatal contract upstream UDFs rely on (one bad blob must become a
NULL row, not a dead Spark task; same posture as the CBOR codec and the
reference's payload handling, /root/reference/src/runner.rs:180-196).

Luminance for color inputs is integer Rec.601: (299*R + 587*G + 114*B)
// 1000 — exact and engine-independent, so oracle hashes can replay it.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class CodecError(ValueError):
    """Malformed or unsupported media payload."""


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte container detection: 'wav' | 'bmp' | 'png' | None."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == PNG_SIG:
        return "png"
    return None


def _luma(rgb: np.ndarray) -> np.ndarray:
    """Integer Rec.601 luminance of an (..., 3) uint8 RGB array."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


# ---------------------------------------------------------------------------
# WAV


def encode_wav(samples: bytes | np.ndarray, sample_rate: int = 8000) -> bytes:
    """8-bit unsigned mono PCM via the stdlib ``wave`` writer (the
    independent implementation the struct decoder is tested against)."""
    if isinstance(samples, np.ndarray):
        samples = samples.astype(np.uint8).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Struct-level RIFF/WAVE parser (PCM only). Returns
    ``{sample_rate, n_channels, sampwidth, samples}`` with samples a
    1-D interleaved numpy array (uint8 for 8-bit, int16 for 16-bit)."""
    if sniff_format(payload) != "wav":
        raise CodecError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from("<I", payload, i + 4)
        body_at = i + 8
        if body_at + clen > n:
            raise CodecError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise CodecError("fmt chunk too short")
            tag, ch, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, body_at
            )
            if tag != 1:
                raise CodecError(f"unsupported WAV format tag {tag} (PCM only)")
            if bits not in (8, 16):
                raise CodecError(f"unsupported bit depth {bits}")
            if ch < 1:
                raise CodecError("zero channels")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data = payload[body_at : body_at + clen]
        i = body_at + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("missing fmt /data chunk")
    ch, rate, bits = fmt
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    else:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "sampwidth": bits // 8,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# BMP

_BMP_HDR = 14
_BMP_INFO = 40


def encode_bmp(pixels: np.ndarray) -> bytes:
    """8-bit paletted grayscale BMP (bottom-up, 4-byte-padded rows,
    identity gray palette) from an (h, w) uint8 array."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise CodecError("encode_bmp wants a non-empty (h, w) uint8 array")
    h, w = a.shape
    stride = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = _BMP_HDR + _BMP_INFO + len(palette)
    rows = bytearray()
    pad = b"\x00" * (stride - w)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += a[y].tobytes() + pad
    info = struct.pack(
        "<IiiHHIIiiII", _BMP_INFO, w, h, 1, 8, 0, len(rows), 2835, 2835, 256, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    return hdr + info + palette + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → (h, w) uint8 luminance. 8-bit paletted (mapped through the
    palette's luminance) and 24-bit BGR; bottom-up or top-down."""
    if sniff_format(payload) != "bmp":
        raise CodecError("not a BMP payload")
    if len(payload) < _BMP_HDR + _BMP_INFO:
        raise CodecError("truncated BMP header")
    (offset,) = struct.unpack_from("<I", payload, 10)
    info_size, w, h_signed, planes, bits, compression = struct.unpack_from(
        "<IiiHHI", payload, _BMP_HDR
    )
    if info_size < _BMP_INFO:
        raise CodecError(f"unsupported BMP info header size {info_size}")
    if compression != 0:
        raise CodecError(f"unsupported BMP compression {compression}")
    if bits not in (8, 24):
        raise CodecError(f"unsupported BMP bit depth {bits}")
    if w <= 0 or h_signed == 0:
        raise CodecError("degenerate BMP dimensions")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if bits == 8:
        (clr_used,) = struct.unpack_from("<I", payload, _BMP_HDR + 32)
        n_pal = clr_used or 256
        pal_at = _BMP_HDR + info_size
        pal = np.frombuffer(payload, dtype=np.uint8, offset=pal_at, count=n_pal * 4)
        if pal.size < n_pal * 4:
            raise CodecError("truncated BMP palette")
        pal = pal.reshape(n_pal, 4)  # B, G, R, reserved
        lut = _luma(pal[:, [2, 1, 0]])
        stride = (w + 3) & ~3
        need = offset + stride * h
        if len(payload) < need:
            raise CodecError("truncated BMP pixel data")
        raw = np.frombuffer(payload, dtype=np.uint8, offset=offset, count=stride * h)
        idx = raw.reshape(h, stride)[:, :w]
        if idx.max(initial=0) >= n_pal:
            raise CodecError("palette index out of range")
        out = lut[idx]
    else:
        stride = (w * 3 + 3) & ~3
        need = offset + stride * h
        if len(payload) < need:
            raise CodecError("truncated BMP pixel data")
        raw = np.frombuffer(payload, dtype=np.uint8, offset=offset, count=stride * h)
        bgr = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        out = _luma(bgr[:, :, ::-1])
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)


# ---------------------------------------------------------------------------
# PNG


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit grayscale PNG from an (h, w) uint8 array. ``filter_type``
    selects the per-row filter (0..4) so tests can exercise every
    reconstruction path; 0 (None) is the production default."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise CodecError("encode_png wants a non-empty (h, w) uint8 array")
    if filter_type not in (0, 1, 2, 3, 4):
        raise CodecError(f"bad filter type {filter_type}")
    h, w = a.shape
    cur = a.astype(np.int64)
    prev = np.zeros((h, w), dtype=np.int64)
    prev[1:] = cur[:-1]
    left = np.zeros((h, w), dtype=np.int64)
    left[:, 1:] = cur[:, :-1]
    ul = np.zeros((h, w), dtype=np.int64)
    ul[1:, 1:] = cur[:-1, :-1]
    if filter_type == 0:
        filt = cur
    elif filter_type == 1:
        filt = cur - left
    elif filter_type == 2:
        filt = cur - prev
    elif filter_type == 3:
        filt = cur - (left + prev) // 2
    else:
        p = left + prev - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
        filt = cur - pred
    body = (filt % 256).astype(np.uint8)
    scan = b"".join(bytes([filter_type]) + body[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w) uint8 luminance. Bit depth 8; color types 0
    (grayscale, returned as-is) and 2 (RGB → Rec.601 luminance); all
    five scanline filters reconstructed per PNG spec §9."""
    if sniff_format(payload) != "png":
        raise CodecError("not a PNG payload")
    i = len(PNG_SIG)
    n = len(payload)
    ihdr = None
    idat = bytearray()
    while i + 12 <= n:
        (clen,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise CodecError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + clen)
        if crc != zlib.crc32(ctype + body):
            raise CodecError(f"bad CRC on {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None or not idat:
        raise CodecError("missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or ctype_ not in (0, 2):
        raise CodecError(f"unsupported PNG depth/color {depth}/{ctype_}")
    if comp != 0 or filt != 0:
        raise CodecError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise CodecError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise CodecError("degenerate PNG dimensions")
    bpp = 1 if ctype_ == 0 else 3
    try:
        scan = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise CodecError("corrupt IDAT stream") from ex
    stride = w * bpp
    if len(scan) != h * (1 + stride):
        raise CodecError("scanline data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row_at = y * (1 + stride)
        ftype = scan[row_at]
        raw = np.frombuffer(scan, dtype=np.uint8, offset=row_at + 1, count=stride)
        cur = raw.astype(np.int64)
        if ftype == 0:
            rec = cur
        elif ftype == 2:
            rec = (cur + prev) % 256
        elif ftype in (1, 3, 4):
            # left/upper-left terms are recursive within the row
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise CodecError(f"bad scanline filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    if bpp == 1:
        return out
    return _luma(out.reshape(h, w, 3))


def decode_image_payload(payload: bytes) -> np.ndarray:
    """Container-sniffing image decode: BMP or PNG → (h, w) uint8."""
    kind = sniff_format(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    raise CodecError("unrecognized image container")
