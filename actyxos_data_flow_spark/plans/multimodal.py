"""Multimodal-pipeline queries over the ``documents`` corpus lifted into
the binary media convention (operators/multimodal.py).

The payloads are utf-8 bytes of ASCII text (verified: octet_length ==
length for every synthetic doc), so DuckDB's character functions
replicate the byte-level Python operators exactly — the oracles check
the REAL distributed plumbing (binary columns through mapInPandas),
with the codec stubbed deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..sources import load_table
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
    """Binary payload → stub codec → typed dims. Validates the decode
    plumbing (binary in, struct-ish out) against a char-math oracle."""
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
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
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"), frame_bytes=FRAME_BYTES)
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
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
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
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"), frame_bytes=FRAME_BYTES)
    frames = M.sample_frames(media, every=EVERY, frame_bytes=FRAME_BYTES)
    digests = frames.select(
        "media_id", F.md5(F.col("frame")).alias("digest")
    ).distinct()
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
    """Per-window PCM RMS energy over the media-lifted corpus (payload
    bytes as 8-bit samples). The oracle replays the byte values via
    ascii() — sums of squares are exact integers, so the hash gate is
    exact, not approximate."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    return M.audio_rms_windows(media, window=RMS_WINDOW)


# -- perceptual hash (dHash) near-dup --------------------------------------

PH_DW, PH_DH = 8, 4
PH_MAX_HAMMING = 4

# oracle replays fake_decode arithmetic: w/h from the 4-byte header,
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
), ph AS (
  SELECT doc_id AS media_id,
         string_agg(CASE WHEN pl > pr THEN '1' ELSE '0' END, '' ORDER BY r, c) AS phash
  FROM g GROUP BY doc_id
)
"""

MM_PHASH_ORACLE = _PHASH_CTE + "SELECT media_id, phash FROM ph"


@register("mm_phash", oracle=MM_PHASH_ORACLE)
def mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash perceptual fingerprints over the media-lifted corpus:
    decode (stub codec) → 9×4 grid → 32 horizontal-gradient bits."""
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
    return M.perceptual_hash(media, dw=PH_DW, dh=PH_DH)


_PH_HAMMING = " + ".join(
    f"(substr(a.phash, {j}, 1) <> substr(b.phash, {j}, 1))::INT"
    for j in range(1, PH_DW * PH_DH + 1)
)

# banding has FULL recall at the threshold (pigeonhole over
# max_hamming+1 bands), so the oracle can use plain all-pairs hamming
MM_PHASH_PAIRS_ORACLE = _PHASH_CTE + f"""
SELECT a.media_id AS id_a, b.media_id AS id_b, {_PH_HAMMING} AS hamming
FROM ph a JOIN ph b ON a.media_id < b.media_id
WHERE {_PH_HAMMING} <= {PH_MAX_HAMMING}
"""


@register("mm_phash_pairs", oracle=MM_PHASH_PAIRS_ORACLE, bench=True)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by perceptual hash: the 32-bit dHash reuses
    the text SimHash pigeonhole banding (max_hamming+1 bands → full
    recall at the threshold), so candidate pairing is the banded
    equi-join, never all-pairs — the oracle's quadratic join is the
    semantic spec only."""
    from ..operators import dedup as D

    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
    ph = M.perceptual_hash(media, dw=PH_DW, dh=PH_DH)
    sig = ph.select("media_id", F.col("phash").alias("simhash"))
    pairs = D.simhash_near_pairs(sig, id_col="media_id", max_hamming=PH_MAX_HAMMING)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
