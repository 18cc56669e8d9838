"""Pinned, deterministic hash functions.

The reference hashes tokens with JVM ``String.hashCode()`` and n-grams
with ``List<Int>.hashCode()`` (/root/reference/src/main/kotlin/jp/ac/
osaka_u/sdl/nil/usecase/preprocess/SymbolSeparator.kt:41,
entity/TokenSequence.kt:10); its Python analysis port uses the
process-salted ``hash()`` builtin (analysis/similarity_calculator.py:96)
— a determinism bug we must not repeat: on a 1000-executor cluster every
hash must be identical across executors, runs, and the test oracle.

Two pinned hash families:

* ``fnv1a64`` / ``ngram_hash`` — the engine's internal term ids.  Pure
  integer arithmetic, identical in the pandas UDFs (executors) and the
  pure-Python oracle (driver/tests).  Masked to 63 bits so the value is
  a non-negative Spark ``LongType``.

* ``md5_prefix64`` — a *cross-system* hash expressible identically in
  Spark (``conv(substring(md5(x),1,15),16,10)``), DuckDB
  (``('0x' || substr(md5(x),1,15))::BIGINT``) and Python.  Used by the
  correctness-gate queries whose oracle is DuckDB SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MASK63 = (1 << 63) - 1
MASK64 = (1 << 64) - 1
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
POLY_P = 1099511628211  # n-gram rolling-hash multiplier (= FNV prime)


def fnv1a64(token: str) -> int:
    """FNV-1a 64-bit over UTF-8 bytes, masked to 63 bits (>= 0)."""
    h = FNV_OFFSET
    for b in token.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) & MASK64
    return h & MASK63


def ngram_hash(token_hashes, start: int, n: int) -> int:
    """Polynomial combine of ``n`` token hashes starting at ``start``."""
    h = 0
    for i in range(start, start + n):
        h = (h * POLY_P + int(token_hashes[i])) & MASK64
    return h & MASK63


def ngram_hashes_np(token_hashes: np.ndarray, n: int) -> np.ndarray:
    """Vectorized sliding-window polynomial hash over a doc's token-hash
    array.  Returns ``len - n + 1`` 63-bit masked int64 term ids.

    Matches ``ngram_hash`` exactly (uint64 wraparound arithmetic).
    """
    t = token_hashes.astype(np.uint64)
    m = len(t) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=np.uint64)
        p = np.uint64(POLY_P)
        for i in range(n):
            acc = acc * p + t[i : i + m]
    return (acc & np.uint64(MASK63)).astype(np.int64)


def md5_prefix64_py(s: str) -> int:
    """First 15 hex chars (60 bits) of md5 as int — matches the Spark
    column and DuckDB SQL forms below bit-for-bit."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_prefix64_col(c: Column) -> Column:
    """Spark column: 60-bit md5-prefix hash (cross-system pinned)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_prefix64_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit md5-prefix hash."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ----------------------------------------------- murmur3 (Iceberg bucket)
#
# Iceberg's bucket partition transform is pinned by the public spec to
# 32-bit Murmur3 (x86 variant, seed 0) over the value's canonical byte
# form: ints/longs/timestamps as the 8-byte little-endian long, strings
# as UTF-8 bytes; bucket = (hash & Integer.MAX_VALUE) % N
# (https://iceberg.apache.org/spec/#appendix-b-32-bit-hash-requirements).
# Test vectors from the spec appendix: hashLong(34) = 2017239379,
# hashString("iceberg") = 1210000089.

_MM3_C1 = 0xCC9E2D51
_MM3_C2 = 0x1B873593
_U32 = 0xFFFFFFFF


def mmh3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit over ``data`` → UNSIGNED 32-bit int."""
    h = seed & _U32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : (i + 1) * 4], "little")
        k = (k * _MM3_C1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * _MM3_C2) & _U32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _U32
        h = (h * 5 + 0xE6546B64) & _U32
    tail = data[nblocks * 4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * _MM3_C1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * _MM3_C2) & _U32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _U32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _U32
    h ^= h >> 16
    return h


def mmh3_32_i64(v: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_32 (seed 0) of int64 values as 8-byte
    little-endian longs — identical to ``mmh3_32(v.tobytes('<q'))``
    per element.  Returns uint32."""
    x = np.ascontiguousarray(v, np.int64).view(np.uint64)
    h = np.zeros(len(x), np.uint32)
    with np.errstate(over="ignore"):
        for blk in ((x & _U32), (x >> np.uint64(32))):
            k = blk.astype(np.uint32)
            k = k * np.uint32(_MM3_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_MM3_C2)
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def iceberg_bucket_long(v, n: int):
    """Iceberg bucket[n] of int64 scalar/array (ints, timestamps as
    micros): (mmh3 & INT_MAX) % n."""
    if isinstance(v, np.ndarray):
        return ((mmh3_32_i64(v) & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype(
            np.int32
        )
    return (mmh3_32(int(v).to_bytes(8, "little", signed=True)) & 0x7FFFFFFF) % n


def iceberg_bucket_str(s: str, n: int) -> int:
    """Iceberg bucket[n] of a string (UTF-8 bytes)."""
    return (mmh3_32(s.encode("utf-8")) & 0x7FFFFFFF) % n
