"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The decode step is REAL for uncompressed formats — pure-NumPy decoders
for PPM/PGM (P6/P5 binary netpbm) and 24-bit uncompressed BMP, no
imaging libraries needed (``decode_ppm`` / ``decode_bmp`` /
``decode_image``).  Compressed codecs (PNG/JPEG) still raise
``NotImplementedError`` from :func:`decode_image` because their
libraries are absent in this environment; the dispatch, schema, Arrow
batch shape, and partitioning are identical either way.  A
deterministic fake path (:func:`fake_decode_features`) is kept for
payloads with no decodable magic, so arbitrary binary columns still
flow through the same pipeline.

Scale notes: feature extraction is embarrassingly parallel
(``mapInPandas``, no shuffle); payloads stay in executor-side Arrow
buffers and never concatenate into one Python object.  At 100 TB the
only knob is ``spark.sql.files.maxPartitionBytes`` / Arrow batch size
so a batch of payload blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, "
    "width int, height int, n_frames int, mean_channel double, codec string"
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
            F.lit("application/octet-stream").alias("mime"),
            F.length(text_col).cast("long").alias("declared_size"),
        ).alias("media_meta"),
    )


def with_ppm_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a REAL (decodable) image payload: a binary P6 netpbm whose
    dimensions derive from the text length and whose raster is a solid
    fill derived from the doc id.  Entirely JVM-side column expressions
    (concat/repeat/char — no UDF), and every byte is printable ASCII,
    so an exact SQL oracle can reconstruct the payload string and its
    md5.  width = len(text) % 16 + 1, height = (len(text) // 16) % 16
    + 1, fill byte = 33 + doc_id % 94.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        (F.length(text_col) % 16 + 1).cast("int").alias("w"),
        (F.floor(F.length(text_col) / 16).cast("int") % 16 + 1).cast("int").alias("h"),
        (F.col(id_col) % 94 + 33).cast("int").alias("fill"),
    )
    return base.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("P6\n"),
                F.col("w").cast("string"),
                F.lit(" "),
                F.col("h").cast("string"),
                F.lit("\n255\n"),
                F.expr("repeat(char(fill), w * h * 3)"),
            ),
            "utf-8",
        ).alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            (F.col("w") * F.col("h") * 3).cast("long").alias("declared_size"),
        ).alias("media_meta"),
    )


def decode_ppm(data: bytes) -> np.ndarray:
    """Pure-NumPy netpbm decoder: binary P6 (RGB) / P5 (grayscale).

    Handles header comments and arbitrary whitespace per the netpbm
    spec; maxval must be < 256 (1 byte/sample).  Returns uint8 ndarray
    of shape (height, width, 3) for P6 or (height, width, 1) for P5.
    """
    magic = bytes(data[:2])
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: magic {magic!r}")
    pos, vals = 2, []
    n = len(data)
    while len(vals) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < n and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        vals.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if not (0 < maxval < 256):
        raise NotImplementedError(f"2-byte netpbm samples (maxval={maxval})")
    ch = 3 if magic == b"P6" else 1
    count = w * h * ch
    if n - pos < count:
        raise ValueError(f"netpbm raster truncated: need {count}, have {n - pos}")
    return np.frombuffer(data, dtype=np.uint8, count=count, offset=pos).reshape(
        h, w, ch
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Pure-NumPy BMP decoder: 24-bit uncompressed (BI_RGB) only — the
    layout Windows bitmaps and most tooling emit for raw dumps.
    Handles 4-byte row padding and bottom-up (positive height) vs
    top-down (negative height) storage.  Returns uint8 (h, w, 3) RGB.
    """
    if bytes(data[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BI_RGB supported (bpp={bpp}, compression={comp})"
        )
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off)
    arr = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return arr if top_down else arr[::-1]


def decode_image(data: bytes) -> np.ndarray:
    """Decode an image payload to a uint8 (h, w, channels) array.

    REAL for uncompressed formats (netpbm P5/P6, 24-bit BMP — pure
    NumPy, zero dependencies).  Compressed codecs (PNG/JPEG/…) need
    PIL/opencv, absent in this environment, and raise
    ``NotImplementedError`` — swap a library-backed branch in here when
    they are installed; callers are agnostic to which branch decoded.
    """
    head = bytes(data[:2])
    if head in (b"P6", b"P5"):
        return decode_ppm(data)
    if head == b"BM":
        return decode_bmp(data)
    raise NotImplementedError(
        "compressed image codecs (PNG/JPEG/...) require PIL/opencv, not "
        "available in this environment; PPM/PGM/BMP decode natively"
    )


def fake_decode_features(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic fake decode for payloads with no decodable magic:
    md5-derived dimensions.

    Pinned so the whole pipeline has an exact SQL oracle:
    width = (first 8 md5 hex digits as int) % 512 + 1,
    height = (next 8) % 512 + 1, n_frames = n_bytes // 100 + 1.
    """
    h = hashlib.md5(payload).hexdigest()
    w = int(h[:8], 16) % 512 + 1
    ht = int(h[8:16], 16) % 512 + 1
    return len(payload), h, w, ht, len(payload) // 100 + 1


def extract_features(df_with_payload: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, content_md5, width, height, n_frames,
    mean_channel, codec) via one Arrow-batched pass — the multimodal
    feature-extract shape.

    Payloads with a decodable magic (netpbm/BMP) are REALLY decoded:
    width/height come from the parsed header and ``mean_channel`` is
    the mean over the decoded raster array.  Other payloads take the
    deterministic fake path (codec='fake', mean_channel=null).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf["payload"]:
                data = bytes(b)
                head = data[:2]
                if head in (b"P6", b"P5", b"BM"):
                    arr = decode_image(data)
                    rows.append(
                        (
                            len(data),
                            hashlib.md5(data).hexdigest(),
                            arr.shape[1],
                            arr.shape[0],
                            len(data) // 100 + 1,
                            float(arr.mean()),
                            "bmp" if head == b"BM" else "ppm",
                        )
                    )
                else:
                    n, md5h, w, ht, fr = fake_decode_features(data)
                    rows.append((n, md5h, w, ht, fr, None, "fake"))
            out = pd.DataFrame(
                rows,
                columns=[
                    "n_bytes", "content_md5", "width", "height",
                    "n_frames", "mean_channel", "codec",
                ],
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
