"""Media codec tests (operators/codecs.py): handcrafted golden wire
vectors, cross-implementation WAV checks (stdlib ``wave`` vs the struct
parser), PNG filter reconstruction for all five filter types, BMP
palette/24-bit/top-down variants, property round-trips, and the
malformed-input skip contract (everything raises CodecError)."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from actyxos_data_flow_spark.operators.codecs import (
    PNG_SIG,
    CodecError,
    decode_bmp,
    decode_image_payload,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_format,
)

# ---------------------------------------------------------------------------
# WAV: two independent implementations must agree both ways


def test_wav_roundtrip_vs_stdlib():
    samples = bytes(range(256)) * 3
    payload = encode_wav(samples, sample_rate=8000)  # stdlib writer
    got = decode_wav(payload)  # struct parser
    assert got["sample_rate"] == 8000
    assert got["n_channels"] == 1
    assert got["sampwidth"] == 1
    assert bytes(got["samples"]) == samples
    # and the stdlib READER agrees with the struct parser
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 8000
        assert w.getnframes() == len(samples)
        assert w.readframes(len(samples)) == samples


def test_wav_16bit_stereo_handwritten():
    """Hand-built RIFF with 16-bit stereo PCM (our encoder never writes
    this shape, so the parser is exercised on foreign input)."""
    frames = struct.pack("<6h", 0, 1000, -1000, 32767, -32768, 5)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = decode_wav(payload)
    assert got["sample_rate"] == 44100
    assert got["n_channels"] == 2
    assert got["sampwidth"] == 2
    assert got["samples"].tolist() == [0, 1000, -1000, 32767, -32768, 5]


def test_wav_skips_foreign_chunks_and_odd_padding():
    """RIFF chunk walk: LIST chunk before fmt/data, odd-length chunk
    padded to word boundary (RIFF rule) must not desync the parser."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    odd = b"junk" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    body = odd + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + bytes([9, 8, 7, 6])
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav(payload)["samples"].tolist() == [9, 8, 7, 6]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:20],  # truncated mid-fmt
        lambda p: p.replace(b"WAVE", b"AIFF"),  # wrong form type
        lambda p: p.replace(b"fmt ", b"fmx "),  # no fmt chunk
        lambda p: p.replace(struct.pack("<H", 1), struct.pack("<H", 3), 1),  # float tag
    ],
)
def test_wav_malformed_raises(mutate):
    payload = encode_wav(bytes(16), sample_rate=8000)
    with pytest.raises(CodecError):
        decode_wav(mutate(payload))


# ---------------------------------------------------------------------------
# BMP


def test_bmp_roundtrip_exact():
    a = np.arange(7 * 5, dtype=np.uint8).reshape(5, 7) * 3 % 256
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)


def test_bmp_golden_handwritten_2x2():
    """Fully handwritten 8-bit BMP (gray palette, bottom-up, padded
    rows) — decoder checked against the wire format itself, not our
    encoder."""
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + 1024
    # rows bottom-up: row1 = [30, 40], row0 = [10, 20]; stride pads 2→4
    pixels = bytes([30, 40, 0, 0, 10, 20, 0, 0])
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pixels), 0, 0, 256, 0)
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    payload = hdr + info + palette + pixels
    assert decode_bmp(payload).tolist() == [[10, 20], [30, 40]]


def test_bmp_top_down_and_24bit():
    """Top-down (negative height) 24-bit BGR decodes to integer Rec.601
    luminance in natural row order."""
    # 1×2: pure red and pure green, row-padded to 8 bytes
    pixels = bytes([0, 0, 255, 0, 255, 0, 0, 0])
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    offset = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    got = decode_bmp(hdr + info + pixels)
    assert got.tolist() == [[299 * 255 // 1000, 587 * 255 // 1000]]


def test_bmp_nongray_palette_goes_through_luma():
    payload = bytearray(encode_bmp(np.zeros((1, 1), dtype=np.uint8)))
    pal_at = 14 + 40  # palette entry 0 → pure blue (B,G,R,0)
    payload[pal_at : pal_at + 4] = bytes([255, 0, 0, 0])
    assert decode_bmp(bytes(payload)).tolist() == [[114 * 255 // 1000]]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:30],
        lambda p: p[:28] + struct.pack("<H", 4) + p[30:],  # 4-bit depth
        lambda p: p[:30] + struct.pack("<I", 1) + p[34:],  # RLE compression
        lambda p: p[:-8],  # truncated pixel data
    ],
)
def test_bmp_malformed_raises(mutate):
    payload = encode_bmp(np.ones((4, 4), dtype=np.uint8))
    with pytest.raises(CodecError):
        decode_bmp(mutate(payload))


# ---------------------------------------------------------------------------
# PNG


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(ftype):
    rng = np.random.default_rng(42 + ftype)
    a = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    payload = encode_png(a, filter_type=ftype)
    assert np.array_equal(decode_png(payload), a)


def test_png_golden_handwritten_1x2_gray():
    """Handwritten PNG: one row, filter 1 (Sub) — second pixel stored
    as a delta; checks signature, CRCs, zlib stream, reconstruction."""
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    scan = bytes([1, 50, 7])  # filter=Sub, px0=50, px1=50+7
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
    payload = (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )
    assert decode_png(payload).tolist() == [[50, 57]]


def test_png_rgb_luma_handwritten():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    scan = bytes([0, 255, 0, 0])  # one pure-red pixel, filter None
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
    payload = (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )
    assert decode_png(payload).tolist() == [[299 * 255 // 1000]]


def test_png_idat_split_across_chunks():
    """IDAT may be split arbitrarily; decoders must concatenate."""
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = encode_png(a)
    # split the single IDAT into two
    at = payload.index(b"IDAT") - 4
    (clen,) = struct.unpack_from(">I", payload, at)
    data = payload[at + 8 : at + 8 + clen]
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
    rebuilt = (
        payload[:at]
        + chunk(b"IDAT", data[:3])
        + chunk(b"IDAT", data[3:])
        + payload[at + 12 + clen :]
    )
    assert np.array_equal(decode_png(rebuilt), a)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:-1],  # truncated IEND CRC... still has IDAT; corrupt tail chunk
        lambda p: p[:20] + bytes([p[20] ^ 1]) + p[21:],  # flip a bit in IHDR → CRC fail
        lambda p: p.replace(b"\x00\x00\x00\x00\x49\x45\x4e\x44", b""),  # drop IEND + len
    ],
)
def test_png_malformed_raises(mutate):
    payload = encode_png(np.ones((2, 2), dtype=np.uint8))
    broken = mutate(payload)
    if broken == payload:
        pytest.skip("mutation not applicable to this encoding")
    try:
        got = decode_png(broken)
    except CodecError:
        return
    # dropping trailing chunks may legitimately still decode; require
    # the pixels to be intact in that case
    assert got.tolist() == [[1, 1], [1, 1]]


def test_png_interlace_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
    payload = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\x00ab")) + chunk(b"IEND", b"")
    with pytest.raises(CodecError):
        decode_png(payload)


# ---------------------------------------------------------------------------
# properties + sniffing


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([0, 1, 2, 3, 4]),
)
def test_property_roundtrips(h, w, seed, ftype):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)
    assert np.array_equal(decode_png(encode_png(a, filter_type=ftype)), a)
    flat = a.tobytes()
    assert bytes(decode_wav(encode_wav(flat))["samples"]) == flat


def test_sniff_and_dispatch():
    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    bmp, png, wav = encode_bmp(a), encode_png(a), encode_wav(b"abc")
    assert sniff_format(bmp) == "bmp"
    assert sniff_format(png) == "png"
    assert sniff_format(wav) == "wav"
    assert sniff_format(b"plain text here") is None
    assert np.array_equal(decode_image_payload(bmp), a)
    assert np.array_equal(decode_image_payload(png), a)
    with pytest.raises(CodecError):
        decode_image_payload(wav)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=60))
def test_arbitrary_bytes_never_crash_decoders(b):
    """Garbage in → CodecError (the skip contract), never any other
    exception type."""
    for fn in (decode_bmp, decode_png, decode_wav, decode_image_payload):
        try:
            fn(b)
        except CodecError:
            pass
