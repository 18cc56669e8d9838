"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio decode libraries are not available in this environment,
so the decode step is STUBBED two ways:
 * :func:`decode_image` — the real-library entry point, raises
   ``NotImplementedError`` with the intended contract documented;
 * :func:`fake_decode_features` — a deterministic fake (md5-derived
   dimensions) so the Spark-side plumbing — binary schema, Arrow batch
   shape, UDF signature, partitioning — is real and oracle-testable.

Scale notes: feature extraction is embarrassingly parallel
(``mapInPandas``, no shuffle); payloads stay in executor-side Arrow
buffers and never concatenate into one Python object.  At 100 TB the
only knob is ``spark.sql.files.maxPartitionBytes`` / Arrow batch size
so a batch of payload blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, "
    "fake_width int, fake_height int, n_frames int"
)


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload column + typed metadata.

    In production the payload would be image/audio/video bytes read from
    object storage; here it is the utf-8 encoding of the text column —
    the plumbing (BinaryType column, nullable metadata struct) is
    identical either way.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(text_col).cast("long").alias("declared_size"),
        ).alias("media_meta"),
    )


def decode_image(data: bytes):  # pragma: no cover - stub by design
    """REAL decode entry point (PIL/opencv absent in this container).

    Contract: bytes -> (height, width, channels, ndarray).  Swap this in
    (and route :func:`extract_features` through it) when the imaging
    libraries are installed.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this environment; "
        "use fake_decode_features for deterministic plumbing tests"
    )


def fake_decode_features(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic fake decode: md5-derived dimensions.

    Pinned so the whole pipeline has an exact SQL oracle:
    width = (first 8 md5 hex digits as int) % 512 + 1,
    height = (next 8) % 512 + 1, n_frames = n_bytes // 100 + 1.
    """
    h = hashlib.md5(payload).hexdigest()
    w = int(h[:8], 16) % 512 + 1
    ht = int(h[8:16], 16) % 512 + 1
    return len(payload), h, w, ht, len(payload) // 100 + 1


def extract_features(df_with_payload: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, content_md5, fake_width, fake_height, n_frames)
    via one Arrow-batched pass — the multimodal feature-extract shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=["n_bytes", "content_md5", "fake_width", "fake_height", "n_frames"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df_with_payload.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df_with_payload: DataFrame, every: int = 3) -> DataFrame:
    """Frame-sampling plumbing: 1 payload row -> N frame rows (every
    ``every``-th fake frame), the video analog of block extraction
    (reference UDTF shape, JavaTransformer.kt:24-52).  Output:
    (doc_id, frame_idx, frame_md5)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                n_frames = len(data) // 100 + 1
                for fi in range(0, n_frames, every):
                    chunk = data[fi * 100 : (fi + 1) * 100]
                    rows.append((doc_id, fi, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return df_with_payload.mapInPandas(
        run, schema="doc_id long, frame_idx int, frame_md5 string"
    )
