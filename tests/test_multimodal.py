"""Multimodal binary-column plumbing: schema, Arrow batch shape,
fan-out frame sampling, deterministic fake decode, and the REAL
pure-NumPy PPM/BMP decoders (known-image unit tests, end-to-end
decode through extract_features)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from nil_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    extract_features,
    fake_decode_features,
    frame_sample,
    with_payload,
    with_ppm_payload,
)


@pytest.fixture(scope="module")
def payloads(spark, transcripts_1k):
    docs = spark.createDataFrame(
        transcripts_1k.head(200).reset_index(drop=True).assign(
            doc_id=range(200)
        )[["doc_id", "text"]]
    )
    return docs, with_payload(docs)


def test_payload_schema_is_binary(payloads):
    _, p = payloads
    assert isinstance(p.schema["payload"].dataType, BinaryType)
    meta = {f.name for f in p.schema["media_meta"].dataType.fields}
    assert meta == {"mime", "declared_size"}


def test_features_deterministic_and_match_local(payloads):
    docs, p = payloads
    got = extract_features(p).toPandas().set_index("doc_id").sort_index()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, row in got.iterrows():
        n, h, w, ht, fr = fake_decode_features(texts[doc_id].encode())
        assert (row["n_bytes"], row["content_md5"]) == (n, h)
        assert (row["width"], row["height"], row["n_frames"]) == (w, ht, fr)
        assert row["codec"] == "fake" and np.isnan(row["mean_channel"])
    # md5 equality with the raw text column (payload is its utf-8 bytes)
    assert (
        got["content_md5"]
        == docs.select("doc_id", F.md5("text").alias("m")).toPandas()
        .set_index("doc_id").sort_index()["m"]
    ).all()


def test_frame_sample_fanout(payloads):
    docs, p = payloads
    frames = frame_sample(p, every=3).toPandas()
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    # one row per sampled frame; frame hashes match local slicing
    by_doc = frames.groupby("doc_id")
    for doc_id, g in by_doc:
        data = texts[doc_id]
        n_frames = len(data) // 100 + 1
        exp_idx = list(range(0, n_frames, 3))
        assert sorted(g["frame_idx"]) == exp_idx
        for _, r in g.iterrows():
            chunk = data[r["frame_idx"] * 100 : (r["frame_idx"] + 1) * 100]
            assert r["frame_md5"] == hashlib.md5(chunk).hexdigest()


# ------------------------------------------------ real decoders (unit)


def test_decode_ppm_known_image():
    """A hand-built 2x2 P6 with a header comment: the decoder must
    return exactly the pixels written, in (h, w, 3) order."""
    pixels = bytes(
        [255, 0, 0,   0, 255, 0,    # row 0: red, green
         0, 0, 255,   9, 8, 7]      # row 1: blue, arbitrary
    )
    data = b"P6\n# a comment\n2 2\n255\n" + pixels
    arr = decode_ppm(data)
    assert arr.shape == (2, 2, 3) and arr.dtype == np.uint8
    np.testing.assert_array_equal(
        arr, np.frombuffer(pixels, np.uint8).reshape(2, 2, 3)
    )
    assert arr.mean() == pytest.approx(np.frombuffer(pixels, np.uint8).mean())


def test_decode_pgm_grayscale_and_errors():
    data = b"P5\n3 1\n255\n" + bytes([10, 20, 30])
    arr = decode_ppm(data)
    assert arr.shape == (1, 3, 1)
    np.testing.assert_array_equal(arr.ravel(), [10, 20, 30])
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n...")  # ascii netpbm not supported
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 5)  # truncated raster
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)  # 2-byte samples


def _make_bmp(pixels_rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal 24-bit BI_RGB writer (test-local, row-padded)."""
    h, w, _ = pixels_rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = pixels_rgb[:, :, ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    raster = b"".join(
        rows[r].tobytes() + b"\x00" * (stride - w * 3) for r in range(h)
    )
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return header + info + raster


@pytest.mark.parametrize("top_down", [False, True])
def test_decode_bmp_known_image(top_down):
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    arr = decode_bmp(_make_bmp(px, top_down=top_down))
    np.testing.assert_array_equal(arr, px)


def test_decode_image_dispatch():
    px = np.zeros((1, 1, 3), np.uint8)
    assert decode_image(_make_bmp(px)).shape == (1, 1, 3)
    assert decode_image(b"P6\n1 1\n255\nabc").shape == (1, 1, 3)
    # compressed codecs remain an explicit stub (libs absent)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_ppm_payload_really_decodes_end_to_end(spark, transcripts_1k):
    """with_ppm_payload -> extract_features: width/height must come from
    the PARSED header and mean_channel from the decoded raster — checked
    against a local decode of the same payload bytes."""
    docs = spark.createDataFrame(
        transcripts_1k.head(50).reset_index(drop=True).assign(
            doc_id=range(50)
        )[["doc_id", "text"]]
    )
    p = with_ppm_payload(docs)
    got = extract_features(p).toPandas().set_index("doc_id").sort_index()
    local = {r["doc_id"]: bytes(r["payload"]) for r in p.collect()}
    for doc_id, row in got.iterrows():
        arr = decode_ppm(local[doc_id])
        assert row["codec"] == "ppm"
        assert (row["width"], row["height"]) == (arr.shape[1], arr.shape[0])
        assert row["mean_channel"] == pytest.approx(float(arr.mean()))
        assert row["content_md5"] == hashlib.md5(local[doc_id]).hexdigest()
        # solid fill: mean equals the doc_id-derived fill byte exactly
        assert row["mean_channel"] == 33 + doc_id % 94
