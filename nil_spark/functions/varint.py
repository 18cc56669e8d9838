"""Vectorized LEB128 varint codec over numpy arrays.

Used by the segment format (operators/segments.py) to delta+varint
compress posting doc-id gaps and tf/dl streams inside Arrow
``BinaryType`` blobs — no per-element Python in either direction:
encode loops over the ≤10 possible byte *positions*, decode uses the
continuation-bit cumsum trick (SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_LOW7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def byte_lengths(values: np.ndarray) -> np.ndarray:
    """LEB128 bytes needed per value: ceil(bitlen/7), min 1."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(len(a), dtype=np.int64)
    rest = a >> _SEVEN
    while rest.any():
        nbytes[rest != 0] += 1
        rest = rest >> _SEVEN
    return nbytes


def encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b""
    nbytes = byte_lengths(a)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    shifted = a.copy()
    k = 0
    alive = np.arange(n)
    while len(alive):
        idx = starts[alive] + k
        byte = (shifted[alive] & _LOW7).astype(np.uint8)
        more = nbytes[alive] > (k + 1)
        out[idx] = np.where(more, byte | _CONT, byte)
        shifted[alive] = shifted[alive] >> _SEVEN
        alive = alive[more]
        k += 1
    return out.tobytes()


def decode(buf: bytes) -> np.ndarray:
    """LEB128 bytes -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & _CONT) == 0
    n = int(is_end.sum())
    # value id per byte = number of terminators strictly before it
    vid = np.zeros(len(raw), dtype=np.int64)
    vid[1:] = np.cumsum(is_end)[:-1]
    # byte position within its value
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(len(raw)) - starts[vid]
    chunks = (raw & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _SEVEN)
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, vid, chunks)
    return out


def encode_deltas(sorted_ids: np.ndarray) -> bytes:
    """strictly-increasing int64 ids -> varint of gaps (first abs)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if len(a) == 0:
        return b""
    gaps = np.empty(len(a), dtype=np.uint64)
    gaps[0] = np.uint64(a[0])
    gaps[1:] = np.diff(a).astype(np.uint64)
    return encode(gaps)


def decode_deltas(buf: bytes) -> np.ndarray:
    gaps = decode(buf)
    if len(gaps) == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))
