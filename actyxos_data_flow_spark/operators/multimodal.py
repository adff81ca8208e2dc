"""Multimodal (image/audio/video) column operators.

Convention: media rides in DataFrames as an opaque ``binary`` payload
column plus typed metadata (kind, format, declared dims) — the payload
is never interpreted by Catalyst, only by Arrow-batched Python UDFs
(``mapInPandas``), which is the correct 100 TB shape: blobs stay
columnar end-to-end, Python sees them zero-copy per batch, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(size it so batch_rows × max_blob fits the executor; repartition by a
key first if blob sizes are skewed).

The actual codec calls (PIL/libav/etc.) are STUBBED — this container
has no media libraries. ``decode_image`` tries a real decoder behind an
import guard and otherwise uses :func:`fake_decode`, a deterministic
stand-in (documented header layout) so every downstream operator —
feature extraction, resize, frame sampling — runs against real bytes
with reproducible results. Swapping in a real codec changes ONE
function; none of the Spark-side plumbing moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fake "image" layout: byte0*256+byte1 = width, byte2*256+byte3 = height,
# remaining bytes = row-major grayscale pixels (truncated/cycled to fit)
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
        F.lit("fake-v1").alias("format"),
        payload.alias("payload"),
        F.struct(
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(0).alias("sample_rate"),
            F.floor(F.length(payload) / frame_bytes).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image codec (STUB — see module
    docstring). Interprets the documented fake header; cycles pixel
    bytes to fill width×height. Raises like a codec would on garbage."""
    if len(payload) < _HEADER:
        raise ValueError("fake-v1: payload shorter than header")
    w = payload[0] * 256 + payload[1]
    h = payload[2] * 256 + payload[3]
    w, h = max(w % 64, 1), max(h % 64, 1)
    body = np.frombuffer(payload, dtype=np.uint8)[_HEADER:]
    if body.size == 0:
        body = np.zeros(1, dtype=np.uint8)
    reps = -(-w * h // body.size)
    return np.tile(body, reps)[: w * h].reshape(h, w)


def _real_decode(payload: bytes):
    """Real codec path — unavailable in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "media codecs not installed; decode uses fake_decode"
        ) from exc
    raise NotImplementedError("real decode wiring lands with the codec")


def decode_image(media: DataFrame) -> DataFrame:
    """payload → (media_id, width, height, pixels binary). Arrow-batched;
    one decode call per row, vectorized dispatch per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": [a.shape[1] for a in px],
                    "height": [a.shape[0] for a in px],
                    "pixels": [a.tobytes() for a in px],
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
                a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
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
    """Audio-path feature extraction: interpret the payload as 8-bit
    PCM samples and emit per-window RMS energy — the silence-detection /
    loudness-normalization primitive of an audio training pipeline
    (with a real codec, ``fake PCM`` becomes decoded samples; the
    Spark-side plumbing is identical).

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
                codes = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
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
                a = fake_decode(bytes(p))
                h_, w_ = a.shape
                yi = (np.arange(dh) * h_ // dh)[:, None]
                xi = (np.arange(dw + 1) * w_ // (dw + 1))[None, :]
                g = a[yi, xi].astype(np.int16)
                bits = (g[:, :-1] > g[:, 1:]).ravel()
                hashes.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(), "phash": hashes})

    return media.select("media_id", "payload").mapInPandas(run, "media_id long, phash string")
