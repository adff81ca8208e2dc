"""Multimodal-pipeline queries over the ``documents`` corpus lifted into
the binary media convention (operators/multimodal.py).

Image/audio queries run the REAL codecs end-to-end: the corpus is
encoded into actual BMP/PNG/WAV files (operators/codecs.py) and decoded
back by the independent parsers inside the distributed plan. The
decoded values are a deterministic function of the text (dims from the
first four bytes, pixels/samples from the byte stream — all ASCII:
octet_length == length for every synthetic doc), so DuckDB's character
functions replay the decode results exactly and the hash gate covers
the full encode → decode round-trip. Frame-sampling queries use the
raw byte lift — they are defined over the frame byte stream, no
container involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from ..operators import multimodal as M
from ..sources import ensure_parallelism, load_table
from . import register

FRAME_BYTES = 16
EVERY = 3

MM_DECODE_ORACLE = """
SELECT doc_id AS media_id,
       greatest((ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1))) % 64, 1) AS width,
       greatest((ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1))) % 64, 1) AS height
FROM documents
"""


@register("mm_decode_meta", oracle=MM_DECODE_ORACLE)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image round-trip: encode each doc's conventional pixel grid
    as an actual BMP (even ids) or PNG (odd ids), then container-sniff
    and decode inside the plan; dims come from the decoded array. The
    char-math oracle proves the decoded geometry, byte-exactly."""
    media = M.encode_documents_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), "mixed")
    return M.decode_image(media).select("media_id", "width", "height")


MM_FRAMES_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text, unnest(generate_series(0, length(text) // {FRAME_BYTES} - 1)) AS i
  FROM documents
)
SELECT doc_id AS media_id, i AS frame_idx,
       substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
FROM f WHERE i % {EVERY} = 0
"""


@register("mm_frame_sample", oracle=MM_FRAMES_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size frame split + every-Nth sampling (the 1:many flat_map
    shape over binary payloads)."""
    media = M.documents_as_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), frame_bytes=FRAME_BYTES)
    frames = M.sample_frames(media, every=EVERY, frame_bytes=FRAME_BYTES)
    return frames.select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx"), F.col("frame").cast("string").alias("frame")
    )


MM_TOPBUCKET_ORACLE = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
hist AS (
  SELECT doc_id, ascii(c) // 16 AS b, count(*) AS n FROM chars GROUP BY 1, 2
),
ranked AS (
  SELECT doc_id, b, n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, b ASC) AS rn
  FROM hist
)
SELECT doc_id AS media_id, b AS top_bucket, n AS top_count FROM ranked WHERE rn = 1
"""


@register("mm_features_topbucket", oracle=MM_TOPBUCKET_ORACLE)
def mm_features_topbucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (16-bucket byte histogram) → dominant bucket.
    Ties break to the lowest bucket on both engines (array_position
    finds the first maximum)."""
    media = M.documents_as_media(ensure_parallelism(load_table(spark, sf_dir, "documents")))
    feats = M.extract_features(media, buckets=16, normalized=False)
    top = F.array_max("features")
    return feats.select(
        "media_id",
        (F.array_position("features", top) - 1).cast("long").alias("top_bucket"),
        top.cast("long").alias("top_count"),
    )


# -- frame-digest near-dup (video-level dedup) -----------------------------

MIN_SHARED = 2

MM_FRAME_DEDUP_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text, unnest(generate_series(0, length(text) // {FRAME_BYTES} - 1)) AS i
  FROM documents
),
d AS (
  SELECT DISTINCT doc_id AS media_id,
         md5(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS digest
  FROM f WHERE i % {EVERY} = 0
)
SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS shared_frames
FROM d a JOIN d b ON a.digest = b.digest AND a.media_id < b.media_id
GROUP BY 1, 2
HAVING count(*) >= {MIN_SHARED}
"""


@register("mm_frame_dedup", oracle=MM_FRAME_DEDUP_ORACLE)
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style dedup by shared frame content: sample frames (the
    real mapInPandas media path), digest each frame, pair media sharing
    ≥ MIN_SHARED distinct frame digests. The pairing is the inverted-
    index shape (join on digest) — pairwise work only within digest
    groups, like the text shingle index; a degenerate digest (e.g. a
    silence/black frame shared by everything) would get the same
    bucket-cap treatment as LSH (operators/dedup.lsh_candidate_pairs)."""
    media = M.documents_as_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), frame_bytes=FRAME_BYTES)
    frames = M.sample_frames(media, every=EVERY, frame_bytes=FRAME_BYTES)
    # persist: the inverted-index self-join references the digest table
    # on both sides; without materialization the mapInPandas frame
    # sampler runs twice (same reasoning as mm_phash_pairs)
    digests = frames.select(
        "media_id", F.md5(F.col("frame")).alias("digest")
    ).distinct()
    digests = cache.pin(digests)
    a, b = digests.alias("a"), digests.alias("b")
    return (
        a.join(b, (F.col("a.digest") == F.col("b.digest")) & (F.col("a.media_id") < F.col("b.media_id")))
        .select(F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .filter(F.col("shared_frames") >= MIN_SHARED)
    )


RMS_WINDOW = 64

AUDIO_RMS_ORACLE = f"""
WITH apos AS (
  SELECT doc_id AS media_id, text,
         unnest(generate_series(1, length(text))) AS i
  FROM documents
),
acode AS (
  SELECT media_id, (i - 1) // {RMS_WINDOW} AS window_id,
         ascii(substr(text, i, 1)) AS c
  FROM apos
)
SELECT media_id, window_id,
       count(*)::INT AS n_samples,
       round(sqrt(sum(c * c) / count(*)::DOUBLE), 6) AS rms
FROM acode
GROUP BY media_id, window_id
"""


@register("mm_audio_rms", oracle=AUDIO_RMS_ORACLE)
def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window RMS energy over REAL WAV files: text bytes → 8-bit
    PCM in a RIFF container (stdlib ``wave`` writer) → independent
    struct parser decodes inside the plan → windowed RMS. The oracle
    replays the sample values via ascii() — sums of squares are exact
    integers, so the hash gate proves the full encode→decode
    round-trip, not an approximation."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    media = M.encode_documents_media(docs, "wav")
    return M.audio_rms_windows(media, window=RMS_WINDOW)


WAV_META_ORACLE = """
SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS n_channels,
       length(text) AS n_samples
FROM documents
"""


@register("mm_wav_meta", oracle=WAV_META_ORACLE)
def mm_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV container metadata extracted by the struct parser (RIFF
    chunk walk): sample rate, channel count, and sample count must
    match what the stdlib encoder was asked to write."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.codecs import decode_wav

    media = M.encode_documents_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), "wav")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, chs, ns = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue  # skipped encode: no row
                m = decode_wav(bytes(p))
                ids.append(int(mid))
                srs.append(m["sample_rate"])
                chs.append(m["n_channels"])
                ns.append(len(m["samples"]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(srs, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, sample_rate int, n_channels int, n_samples long"
    )


# -- resize (nearest-neighbor resample of decoded pixels) ------------------

RS_W, RS_H = 8, 4

# resized pixel (r, c) of the decoded image = source pixel at row
# r*h//RS_H, col c*w//RS_W; source pixel i is body byte (i mod body_len)
# — the same convention the phash oracle replays
MM_RESIZE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, text,
         greatest((ascii(substr(text,1,1))*256 + ascii(substr(text,2,1))) % 64, 1) AS w,
         greatest((ascii(substr(text,3,1))*256 + ascii(substr(text,4,1))) % 64, 1) AS h,
         length(text) - 4 AS bl
  FROM documents
)
SELECT doc_id AS media_id, rr.r, cc.c,
       ascii(substr(text, ((rr.r * h // {RS_H}) * w + (cc.c * w // {RS_W})) % bl + 5, 1)) AS v
FROM m, range(0, {RS_H}) rr(r), range(0, {RS_W}) cc(c)
"""


@register("mm_resize_grid", oracle=MM_RESIZE_ORACLE)
def mm_resize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize through the REAL codec round-trip:
    encode (mixed BMP/PNG) → decode → resample to {RS_W}×{RS_H} →
    per-cell pixel values. The oracle replays the resample geometry
    with character math, so every decoded byte the resampler touches
    is hash-verified."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    media = M.encode_documents_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), "mixed")
    resized = M.resize_image(M.decode_image(media), out_w=RS_W, out_h=RS_H)

    def cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rs, cs, vs = [], [], [], []
            for mid, px in zip(pdf["media_id"], pdf["pixels"]):
                if px is None:
                    continue  # skipped decode: no cells
                a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(RS_H, RS_W)
                for r in range(RS_H):
                    for c in range(RS_W):
                        ids.append(int(mid))
                        rs.append(r)
                        cs.append(c)
                        vs.append(int(a[r, c]))
            yield pd.DataFrame({"media_id": ids, "r": rs, "c": cs, "v": vs})

    return resized.mapInPandas(cells, "media_id long, r long, c long, v int")


# -- perceptual hash (dHash) near-dup --------------------------------------

PH_DW, PH_DH = 8, 4
PH_MAX_HAMMING = 4

# oracle replays the image-payload convention (_doc_pixels — what the
# real BMP/PNG round-trip decodes back to): w/h from the 4-byte header,
# pixel i = body byte (i mod body_len) — ascii() math on the (all-ASCII)
# text; the grid/gradient bits mirror perceptual_hash exactly
_PHASH_CTE = f"""
WITH m AS (
  SELECT doc_id, text,
         greatest((ascii(substr(text,1,1))*256 + ascii(substr(text,2,1))) % 64, 1) AS w,
         greatest((ascii(substr(text,3,1))*256 + ascii(substr(text,4,1))) % 64, 1) AS h,
         length(text) - 4 AS bl
  FROM documents
), g AS (
  SELECT doc_id, rr.r, cc.c,
         ascii(substr(text, ((rr.r * h // {PH_DH}) * w + (cc.c * w // {PH_DW + 1})) % bl + 5, 1)) AS pl,
         ascii(substr(text, ((rr.r * h // {PH_DH}) * w + ((cc.c+1) * w // {PH_DW + 1})) % bl + 5, 1)) AS pr
  FROM m, range(0, {PH_DH}) rr(r), range(0, {PH_DW}) cc(c)
), ph AS MATERIALIZED (
  -- MATERIALIZED: the pairs oracle references ph on BOTH sides of its
  -- all-pairs spec join; inlined, DuckDB re-derives the whole grid
  -- chain per side (measured: half the 10x probe's ~29 min)
  SELECT doc_id AS media_id,
         string_agg(CASE WHEN pl > pr THEN '1' ELSE '0' END, '' ORDER BY r, c) AS phash
  FROM g GROUP BY doc_id
)
"""

MM_PHASH_ORACLE = _PHASH_CTE + "SELECT media_id, phash FROM ph"


@register("mm_phash", oracle=MM_PHASH_ORACLE)
def mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash perceptual fingerprints over really-encoded images: BMP/PNG
    mixed corpus → real decode → 9×4 grid → 32 horizontal-gradient
    bits."""
    media = M.encode_documents_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), "mixed")
    return M.perceptual_hash(media, dw=PH_DW, dh=PH_DH)


_PH_HAMMING = " + ".join(
    f"(substr(pa, {j}, 1) <> substr(pb, {j}, 1))::INT"
    for j in range(1, PH_DW * PH_DH + 1)
)

# The oracle blocks with the SAME pigeonhole banding as the engine
# (simhash_bands: max_hamming+1 disjoint slices — two hashes within
# the threshold must agree on at least one band, so recall is exactly
# the all-pairs spec's). Round 9 shipped the literal quadratic
# all-pairs join as the oracle and its O(n²·32) substr scan was ~29
# minutes of the 10× probe's 1718.9s row; banding is value-identical
# and keeps the oracle gradeable at probe scale.
from ..operators.dedup import simhash_bands as _ph_bands  # noqa: E402

_PH_BAND_CASE = " ".join(
    f"WHEN {i} THEN substr(phash, {st}, {w})"
    for i, (st, w) in enumerate(_ph_bands(PH_MAX_HAMMING, PH_DW * PH_DH))
)

MM_PHASH_PAIRS_ORACLE = _PHASH_CTE + f""",
phb AS (
  SELECT media_id, phash, g.band,
         CASE g.band {_PH_BAND_CASE} END AS piece
  FROM ph, range(0, {PH_MAX_HAMMING + 1}) g(band)
),
phc AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b,
         a.phash AS pa, b.phash AS pb
  FROM phb a JOIN phb b
    ON a.band = b.band AND a.piece = b.piece AND a.media_id < b.media_id
)
SELECT DISTINCT id_a, id_b, hamming FROM (
  SELECT id_a, id_b, {_PH_HAMMING} AS hamming FROM phc
) WHERE hamming <= {PH_MAX_HAMMING}
"""


@register("mm_phash_pairs", oracle=MM_PHASH_PAIRS_ORACLE, bench=True)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by perceptual hash: the 32-bit dHash reuses
    the text SimHash pigeonhole banding (max_hamming+1 bands → full
    recall at the threshold), so candidate pairing is the banded
    equi-join, never all-pairs — the oracle's quadratic join is the
    semantic spec only."""
    from ..operators import dedup as D

    media = M.encode_documents_media(ensure_parallelism(load_table(spark, sf_dir, "documents")), "mixed")
    ph = M.perceptual_hash(media, dw=PH_DW, dh=PH_DH)
    # persist the (id, 32-bit hash) table: the banded self-join
    # references it on BOTH sides, and when AQE broadcasts one side the
    # two sides' exchanges differ — without materialization the whole
    # Python encode+decode chain runs twice (measured 2.7s → 0.4s at
    # sf0.1). The hash table is two narrow columns per image: at any
    # corpus size this is the cheap thing to materialize.
    sig = cache.pin(ph.select("media_id", F.col("phash").alias("simhash")))
    pairs = D.simhash_near_pairs(sig, id_col="media_id", max_hamming=PH_MAX_HAMMING)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
