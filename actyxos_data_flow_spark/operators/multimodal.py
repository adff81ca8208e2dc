"""Multimodal (image/audio/video) column operators.

Convention: media rides in DataFrames as an opaque ``binary`` payload
column plus typed metadata (kind, format, declared dims) — the payload
is never interpreted by Catalyst, only by Arrow-batched Python UDFs
(``mapInPandas``), which is the correct 100 TB shape: blobs stay
columnar end-to-end, Python sees them zero-copy per batch, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(size it so batch_rows × max_blob fits the executor; repartition by a
key first if blob sizes are skewed).

Codecs are REAL wire formats, implemented dependency-free in
:mod:`.codecs`: WAV (RIFF PCM, stdlib ``wave`` encoder vs independent
struct decoder), BMP (paletted + 24-bit), PNG (zlib, chunk CRCs, all
five scanline filters). ``decode_image`` sniffs the container by magic
bytes per row, so one DataFrame can mix formats.
:func:`encode_documents_media` lifts the synthetic ``documents`` corpus
into genuinely-encoded media whose DECODED values are a deterministic
function of the text (dims from the first four bytes, pixels/samples
from the byte stream), which is what lets the DuckDB oracles replay
decode results with plain character math. ``mapInPandas`` end-to-end:
blobs never shuffle; decode happens in the scan stage.

Video-style operators (frame sampling/digesting) use the raw lift
(:func:`documents_as_media`): container parsing there would add nothing
— the operators are defined over the sample/frame byte stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codecs import (
    CodecError,
    decode_image_payload,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_format,
)

# image-payload convention (mirrors the old stub's derivation so every
# oracle's character math still holds): byte0*256+byte1 → width,
# byte2*256+byte3 → height (each %64, min 1); remaining bytes cycle
# row-major to fill width×height
_HEADER = 4

MEDIA_SCHEMA = (
    "media_id long, kind string, format string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def documents_as_media(docs: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """Adapter: lift the synthetic ``documents`` corpus into the media
    convention (payload = utf-8 bytes) so multimodal plumbing exercises
    real distributed data without a media testdata table."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw").alias("format"),
        payload.alias("payload"),
        F.struct(
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(0).alias("sample_rate"),
            F.floor(F.length(payload) / frame_bytes).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _doc_pixels(data: bytes) -> np.ndarray:
    """The documented image-payload convention: dims from the first four
    bytes, body bytes cycled row-major to fill width×height."""
    if len(data) < _HEADER:
        raise CodecError("payload shorter than image header")
    w = max((data[0] * 256 + data[1]) % 64, 1)
    h = max((data[2] * 256 + data[3]) % 64, 1)
    body = np.frombuffer(data, dtype=np.uint8)[_HEADER:]
    if body.size == 0:
        body = np.zeros(1, dtype=np.uint8)
    reps = -(-w * h // body.size)
    return np.tile(body, reps)[: w * h].reshape(h, w)


def encode_documents_media(
    docs: DataFrame, media_format: str = "mixed", sample_rate: int = 8000
) -> DataFrame:
    """Lift ``documents`` into REAL encoded media payloads. Image rows
    encode the conventional pixel grid (:func:`_doc_pixels`) as an
    actual BMP or PNG file; ``"wav"`` encodes the text bytes as 8-bit
    PCM in a RIFF container. ``"mixed"`` alternates BMP/PNG by id so one
    corpus exercises both decoders through the per-row container sniff.

    Because the decoded values are a pure function of the text, the
    DuckDB oracles replay them with character math — the round-trip
    (encode → shuffle-free distributed decode) is what's under test.

    Scale shape: one Arrow-batched ``mapInPandas`` over the scan; no
    shuffle; output blobs are bounded (≤64×64 px + fixed headers)."""
    if media_format not in ("bmp", "png", "wav", "mixed"):
        raise ValueError(f"unknown media_format {media_format!r}")
    kind = "audio" if media_format == "wav" else "image"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, payloads, widths, heights, rates = [], [], [], [], [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or len(str(text)) < _HEADER:
                    # unencodable source row → NULL payload (the skip
                    # contract, symmetric with decode)
                    ids.append(int(mid))
                    fmts.append(None)
                    payloads.append(None)
                    widths.append(None)
                    heights.append(None)
                    rates.append(None)
                    continue
                data = str(text).encode("utf-8")
                if media_format == "wav":
                    payloads.append(encode_wav(data, sample_rate))
                    fmts.append("wav")
                    widths.append(0)
                    heights.append(0)
                    rates.append(sample_rate)
                else:
                    px = _doc_pixels(data)
                    fmt = media_format
                    if fmt == "mixed":
                        fmt = "bmp" if int(mid) % 2 == 0 else "png"
                    payloads.append(encode_bmp(px) if fmt == "bmp" else encode_png(px))
                    fmts.append(fmt)
                    widths.append(px.shape[1])
                    heights.append(px.shape[0])
                    rates.append(0)
                ids.append(int(mid))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": kind,
                    "format": fmts,
                    "payload": payloads,
                    "meta": [
                        {"width": w, "height": h, "sample_rate": r, "n_frames": 0}
                        for w, h, r in zip(widths, heights, rates)
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """payload → (media_id, width, height, pixels binary). Real decode:
    the container is sniffed per row (BMP/PNG can mix in one frame);
    undecodable blobs become NULL-dimension rows, not task failures —
    the skip contract (reference runner.rs:180-196). Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pxs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                try:
                    a = decode_image_payload(bytes(p) if p is not None else b"")
                except CodecError:
                    ws.append(None)
                    hs.append(None)
                    pxs.append(None)
                else:
                    ws.append(a.shape[1])
                    hs.append(a.shape[0])
                    pxs.append(a.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "pixels": pxs,
                }
            )

    return media.mapInPandas(run, schema="media_id long, width int, height int, pixels binary")


def extract_features(media: DataFrame, buckets: int = 16, normalized: bool = True) -> DataFrame:
    """Byte-histogram embedding (``buckets`` dims; L1-normalized unless
    ``normalized=False``, which keeps exact counts) — the
    feature-extraction slot; a real model swaps into the same signature
    (binary in → array<float> out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr // (256 // buckets), minlength=buckets).astype("float64")
                if normalized:
                    total = hist.sum()
                    hist = hist / total if total else hist
                feats.append(hist.astype("float32"))
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(), "features": feats})

    return media.mapInPandas(run, schema="media_id long, features array<float>")


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resample of decoded pixel matrices (STUB kernel;
    a real resampler swaps in per-row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                if px is None or w is None or h is None:
                    out.append(None)  # skipped decode propagates as NULL
                    continue
                a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(int(h), int(w))
                yi = (np.arange(out_h) * int(h) // out_h)[:, None]
                xi = (np.arange(out_w) * int(w) // out_w)[None, :]
                out.append(a[yi, xi].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.full(len(pdf), out_w, dtype="int32"),
                    "height": np.full(len(pdf), out_h, dtype="int32"),
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(run, schema="media_id long, width int, height int, pixels binary")


def sample_frames(media: DataFrame, every: int = 3, frame_bytes: int = 16) -> DataFrame:
    """Frame sampler (1:many — the flat_map shape): split payload into
    fixed-size frames per meta.n_frames, keep every ``every``-th."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                b = bytes(p)
                n = int(meta["n_frames"])
                for i in range(0, n, every):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema="media_id long, frame_idx int, frame binary")


def audio_rms_windows(media: DataFrame, window: int = 64) -> DataFrame:
    """Audio-path feature extraction: decode the payload (RIFF/WAVE via
    the real PCM parser; raw bytes pass through as 8-bit samples for
    byte-stream media) and emit per-window RMS energy — the
    silence-detection / loudness-normalization primitive of an audio
    training pipeline.

    Output: (media_id, window_id, n_samples, rms). The tail window may
    be short. Sums of squares stay in int64 (exact), so the RMS is
    bit-identical across batch orders and engines.

    Scale shape: Arrow-batched ``mapInPandas`` — blobs stream columnar,
    numpy does the windowing per batch, output size is
    n_samples/window rows per blob; no shuffle at all."""
    out_schema = "media_id long, window_id int, n_samples int, rms double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wids, ns, rms = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue  # skipped row: no windows
                raw = bytes(payload)
                if sniff_format(raw) == "wav":
                    codes = decode_wav(raw)["samples"].astype(np.int64)
                else:
                    codes = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                for w in range(0, (len(codes) + window - 1) // window):
                    seg = codes[w * window : (w + 1) * window]
                    ids.append(mid)
                    wids.append(w)
                    ns.append(len(seg))
                    rms.append(round(float(np.sqrt((seg * seg).sum() / len(seg))), 6))
            yield pd.DataFrame(
                {"media_id": ids, "window_id": wids, "n_samples": ns, "rms": rms}
            )

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def perceptual_hash(media: DataFrame, dw: int = 8, dh: int = 4) -> DataFrame:
    """dHash perceptual image fingerprint: decode, nearest-neighbor
    downsample to a (dw+1)×dh luminance grid, emit one bit per
    horizontal gradient (left pixel > right neighbor) — dw*dh bits,
    row-major. Near-identical images (re-encodes, small crops, minor
    edits) land within a few bits; the hash is invariant to uniform
    brightness scaling of the grid comparisons.

    Output: (media_id, phash) with phash a '0'/'1' string of dw*dh
    bits — at the default 8×4 = 32 bits it is directly compatible with
    :func:`..dedup.simhash_near_pairs` (pigeonhole-banded hamming
    blocking), so image near-dup clustering reuses the text machinery.

    Scale shape: Arrow-batched mapInPandas over the opaque payload —
    no shuffle; pairing downstream is the banded equi-join, never
    all-pairs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                try:
                    a = decode_image_payload(bytes(p) if p is not None else b"")
                except CodecError:
                    hashes.append(None)  # skip contract: bad blob → NULL
                    continue
                h_, w_ = a.shape
                yi = (np.arange(dh) * h_ // dh)[:, None]
                xi = (np.arange(dw + 1) * w_ // (dw + 1))[None, :]
                g = a[yi, xi].astype(np.int16)
                bits = (g[:, :-1] > g[:, 1:]).ravel()
                hashes.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(), "phash": hashes})

    return media.select("media_id", "payload").mapInPandas(run, "media_id long, phash string")
