"""Multimodal binary-column plumbing: schema, Arrow batch shape,
fan-out frame sampling, deterministic fake decode, real-decode stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from nil_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_decode_features,
    frame_sample,
    with_payload,
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
        assert (row["fake_width"], row["fake_height"], row["n_frames"]) == (w, ht, fr)
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


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
