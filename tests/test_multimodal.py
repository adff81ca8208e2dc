"""Multimodal plumbing tests: schema/batch shape through mapInPandas,
real BMP/PNG/WAV encode→decode round-trips on distributed data, resize
geometry, frame-sampling flat_map semantics, and feature-vector
invariants."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from actyxos_data_flow_spark.operators import multimodal as M
from actyxos_data_flow_spark.operators.codecs import CodecError, encode_bmp, encode_png
from actyxos_data_flow_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    return M.documents_as_media(docs, frame_bytes=16).cache()


@pytest.fixture(scope="module")
def encoded(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    return M.encode_documents_media(docs, "mixed").cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "format", "payload", "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.first()
    assert row["meta"]["n_frames"] == len(bytes(row["payload"])) // 16


def test_encoded_media_payloads_are_real_containers(encoded):
    """Even ids carry actual BMP files, odd ids actual PNGs — verified
    by magic bytes AND by an independent local decode of the payload."""
    from actyxos_data_flow_spark.operators.codecs import decode_image_payload

    rows = encoded.collect()
    assert rows
    for r in rows:
        p = bytes(r["payload"])
        if r["media_id"] % 2 == 0:
            assert r["format"] == "bmp" and p[:2] == b"BM"
        else:
            assert r["format"] == "png" and p[:8].endswith(b"PNG\r\n\x1a\n")
        a = decode_image_payload(p)
        assert a.shape == (r["meta"]["height"], r["meta"]["width"])


def test_decode_deterministic_and_dims(encoded):
    out = M.decode_image(encoded)
    assert out.schema.simpleString() == "struct<media_id:bigint,width:int,height:int,pixels:binary>"
    rows = {r["media_id"]: r for r in out.collect()}
    # re-run: identical (real decode of fixed bytes is deterministic)
    rows2 = {r["media_id"]: r for r in out.collect()}
    for k in rows:
        assert rows[k] == rows2[k]
        r = rows[k]
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(bytes(r["pixels"])) == r["width"] * r["height"]


def test_decode_bad_payload_becomes_null_row(spark):
    """Undecodable blobs must surface as NULL-dimension rows, not kill
    the task (the skip contract)."""
    good = encode_bmp(np.arange(4, dtype=np.uint8).reshape(2, 2))
    media = spark.createDataFrame(
        [(1, good), (2, b"this is not an image")], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in M.decode_image(media).collect()}
    assert got[1]["width"] == 2 and got[1]["pixels"] is not None
    assert got[2]["width"] is None and got[2]["pixels"] is None


def test_resize_geometry(encoded):
    resized = M.resize_image(M.decode_image(encoded), out_w=8, out_h=4)
    for r in resized.collect():
        assert (r["width"], r["height"]) == (8, 4)
        assert len(bytes(r["pixels"])) == 32


def test_frame_sampling_flatmap(media):
    frames = M.sample_frames(media, every=3, frame_bytes=16)
    per_doc = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in media.select("media_id", "meta").collect()}
    for r in per_doc:
        expected = -(-meta[r["media_id"]] // 3)  # ceil(n/3): frames 0,3,6,...
        assert r["count"] == expected
    f = frames.filter(F.col("frame_idx") == 0).first()
    assert len(bytes(f["frame"])) == 16


def test_features_normalized_l1(media):
    feats = M.extract_features(media, buckets=16).collect()
    for r in feats:
        v = np.array(r["features"], dtype="float64")
        assert v.shape == (16,)
        assert abs(v.sum() - 1.0) < 1e-6
        assert (v >= 0).all()


def test_counts_match_payload_len(media):
    feats = M.extract_features(media, buckets=16, normalized=False)
    joined = feats.join(media.select("media_id", F.length("payload").alias("n")), "media_id")
    for r in joined.collect():
        assert int(sum(r["features"])) == r["n"]


def test_audio_rms_windows_exact_values(spark):
    """Known byte payloads: constant signal's RMS equals the value;
    the tail window is short and averaged over its own length. Raw
    bytes and the same samples wrapped in a real WAV container must
    produce IDENTICAL windows (container transparency)."""
    from actyxos_data_flow_spark.operators.codecs import encode_wav
    from actyxos_data_flow_spark.operators.multimodal import audio_rms_windows

    samples = bytes([10] * 4 + [20] * 2)
    media = spark.createDataFrame(
        [(1, samples), (2, encode_wav(samples))], "media_id long, payload binary"
    )
    got = {
        (r.media_id, r.window_id): (r.n_samples, r.rms)
        for r in audio_rms_windows(media, window=4).collect()
    }
    for mid in (1, 2):
        assert got[(mid, 0)] == (4, 10.0)
        assert got[(mid, 1)] == (2, 20.0)


def _image_payload(header_and_body: bytes, fmt: str = "bmp") -> bytes:
    """Encode the conventional pixel grid of a raw byte string as a
    real container, mirroring encode_documents_media."""
    px = M._doc_pixels(header_and_body)
    return encode_bmp(px) if fmt == "bmp" else encode_png(px)


def test_perceptual_hash_properties(spark):
    # identical pixel content hashes identically REGARDLESS of container
    # (BMP vs PNG); one flipped body byte stays within a few bits
    base = bytes([0, 16, 0, 16]) + bytes(range(40, 120))
    tweaked = bytearray(base)
    tweaked[50] ^= 1  # flip one pixel's low bit
    media = spark.createDataFrame(
        [
            (1, _image_payload(base, "bmp")),
            (2, _image_payload(base, "png")),
            (3, _image_payload(bytes(tweaked), "bmp")),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.phash for r in M.perceptual_hash(media).collect()}
    assert set(len(h) for h in got.values()) == {32}
    assert got[1] == got[2]
    ham = sum(a != b for a, b in zip(got[1], got[3]))
    assert ham <= 4


def test_phash_pairs_via_simhash_banding(spark):
    from actyxos_data_flow_spark.operators import dedup as D

    payload = _image_payload(bytes([0, 8, 0, 8]) + bytes(range(64)), "bmp")
    other = _image_payload(
        bytes([0, 33, 0, 7]) + bytes(255 - i for i in range(64)), "png"
    )
    media = spark.createDataFrame(
        [(1, payload), (2, bytes(payload)), (3, other)],
        "media_id long, payload binary",
    )
    ph = M.perceptual_hash(media)
    sig = ph.select("media_id", F.col("phash").alias("simhash"))
    pairs = {(r.id_a, r.id_b): r.hamming for r in D.simhash_near_pairs(sig, id_col="media_id", max_hamming=2).collect()}
    assert pairs.get((1, 2)) == 0


def test_encode_skips_null_and_short_text_rows(spark):
    """Unencodable source rows (NULL / shorter than the image header)
    become NULL-payload media rows, and every downstream operator
    (decode, resize, phash, RMS) propagates or drops them instead of
    failing the task."""
    docs = spark.createDataFrame(
        [(1, "a proper document with plenty of text to encode here"),
         (2, None), (3, "ab")],
        "doc_id long, text string",
    )
    media = M.encode_documents_media(docs, "mixed")
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["payload"] is not None
    assert rows[2]["payload"] is None and rows[3]["payload"] is None
    decoded = {r["media_id"]: r for r in M.decode_image(media).collect()}
    assert decoded[1]["width"] >= 1 and decoded[2]["width"] is None
    resized = {r["media_id"]: r for r in M.resize_image(M.decode_image(media), 4, 2).collect()}
    assert resized[1]["pixels"] is not None and resized[2]["pixels"] is None
    ph = {r["media_id"]: r["phash"] for r in M.perceptual_hash(media).collect()}
    assert ph[1] is not None and ph[2] is None
    wav = M.encode_documents_media(docs, "wav")
    got = {r.media_id for r in M.audio_rms_windows(wav, window=16).collect()}
    assert got == {1}
