"""Custom stateful streaming operator: exact near-real-time dedup with
``applyInPandasWithState``.

A training-data ingest stream wants every arriving document tagged
duplicate/canonical immediately, not in a nightly batch job.  State is
partitioned by a hash prefix (256 groups): each group's GroupState
holds the content hashes it has seen with the first doc id that carried
them, so the operator scales by adding shuffle partitions — no global
structure, no driver state (the Spark analog of a sharded dedup-service
keyspace).

State format (scale-critical): four COLUMNAR binary blobs per group —
the 128-bit md5 split into two sorted-aligned uint64 arrays (hi is the
search key, lo the exactness check), an aligned int64 canonical-doc
array, and an aligned int64 last-seen-batch array — 32 bytes per unique
hash.  Lookups are ``np.searchsorted`` on the hi key (equal-hi ties,
~birthday-rare at 2^64, fall back to a tiny scan), merges are one
lexsort.  The earlier format held the whole map as ONE json string,
re-parsed and re-serialized every micro-batch and growing without
bound — a per-batch rewrite of a many-GB driver-side-style blob at
100 TB.  The arrays still round-trip through the state store each
batch (that is the applyInPandasWithState contract), but at 32 B/hash
with zero parse cost, and bounded by eviction:

TTL/eviction: pass ``ttl_batches=N`` to evict entries not seen for N
micro-batches (each entry's last-seen batch is refreshed on every
duplicate hit).  Eviction turns the exactness guarantee into a
*windowed* one — a duplicate of a doc last seen more than N batches ago
is re-tagged canonical — which is the standard streaming-dedup
trade-off; ``ttl_batches=None`` (default) keeps the unbounded exact
behavior.

Output per input row: (doc_id, h, is_dup, canon_id) where canon_id is
the doc that first introduced the hash (within a batch, rows are
processed in ascending doc_id so the assignment is deterministic).
Matches the batch ``exact_dedup`` canonical assignment whenever the
stream arrives in ascending doc_id order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = "doc_id long, text string"

_OUT_TYPE = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("h", StringType()),
        StructField("is_dup", BooleanType()),
        StructField("canon_id", LongType()),
    ]
)
_STATE_TYPE = StructType(
    [
        StructField("hi_blob", BinaryType()),
        StructField("lo_blob", BinaryType()),
        StructField("canon_blob", BinaryType()),
        StructField("seen_blob", BinaryType()),
        StructField("batch_no", LongType()),
    ]
)


def _hex_to_u64_pair(hexes) -> tuple[np.ndarray, np.ndarray]:
    """md5 hex strings → (hi, lo) uint64 arrays, one frombuffer pass."""
    if len(hexes) == 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z
    raw = np.frombuffer(bytes.fromhex("".join(hexes)), dtype=">u8").reshape(-1, 2)
    return raw[:, 0].astype(np.uint64), raw[:, 1].astype(np.uint64)


def _lookup(
    st_hi: np.ndarray, st_lo: np.ndarray, bhi: np.ndarray, blo: np.ndarray
) -> np.ndarray:
    """Index into the sorted state arrays for each (bhi, blo), -1 if
    absent.  Vectorized for the unique-hi common case; equal-hi ties
    (≈2^-64 likely) scan their tiny [l, r) run."""
    out = np.full(len(bhi), -1, dtype=np.int64)
    if len(st_hi) == 0:
        return out
    l = np.searchsorted(st_hi, bhi, side="left")
    r = np.searchsorted(st_hi, bhi, side="right")
    single = (r - l) == 1
    pos = l[single]
    out[single] = np.where(st_lo[pos] == blo[single], pos, -1)
    for i in np.flatnonzero((r - l) > 1):
        for j in range(l[i], r[i]):
            if st_lo[j] == blo[i]:
                out[i] = j
                break
    return out


def _dedup_fn_factory(ttl_batches: int | None = None):
    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            s = state.get
            st_hi = np.frombuffer(s[0], dtype=np.uint64)
            st_lo = np.frombuffer(s[1], dtype=np.uint64)
            st_canon = np.frombuffer(s[2], dtype=np.int64)
            st_seen = np.frombuffer(s[3], dtype=np.int64).copy()
            batch_no = int(s[4]) + 1
        else:
            st_hi = st_lo = np.empty(0, dtype=np.uint64)
            st_canon = st_seen = np.empty(0, dtype=np.int64)
            batch_no = 0

        outs = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("doc_id", kind="mergesort")
            did = pdf["doc_id"].to_numpy(np.int64)
            bhi, blo = _hex_to_u64_pair(pdf["h"].tolist())

            idx = _lookup(st_hi, st_lo, bhi, blo)
            in_state = idx >= 0
            st_seen[idx[in_state]] = batch_no  # refresh TTL on hit

            # within-batch firsts for rows absent from state (pdf is in
            # ascending doc_id order, so 'first' is the smallest doc)
            kdf = pd.DataFrame({"hi": bhi, "lo": blo, "doc_id": did})
            first_doc = kdf.groupby(["hi", "lo"], sort=False)["doc_id"].transform(
                "first"
            ).to_numpy(np.int64)

            canon = first_doc.copy()
            canon[in_state] = st_canon[idx[in_state]]
            is_dup = in_state | (first_doc != did)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": did,
                        "h": pdf["h"].to_numpy(),
                        "is_dup": is_dup,
                        "canon_id": canon,
                    }
                )
            )

            # merge this pdf's new hashes into the sorted state so later
            # pdfs of the same batch dedup against them
            new = (~in_state) & (first_doc == did)
            if new.any():
                st_hi = np.concatenate((st_hi, bhi[new]))
                st_lo = np.concatenate((st_lo, blo[new]))
                st_canon = np.concatenate((st_canon, did[new]))
                st_seen = np.concatenate(
                    (st_seen, np.full(int(new.sum()), batch_no, dtype=np.int64))
                )
                order = np.lexsort((st_lo, st_hi))
                st_hi, st_lo = st_hi[order], st_lo[order]
                st_canon, st_seen = st_canon[order], st_seen[order]

        if ttl_batches is not None:
            keep = st_seen >= batch_no - int(ttl_batches)
            if not keep.all():
                st_hi, st_lo = st_hi[keep], st_lo[keep]
                st_canon, st_seen = st_canon[keep], st_seen[keep]

        state.update(
            (
                st_hi.tobytes(),
                st_lo.tobytes(),
                st_canon.tobytes(),
                st_seen.tobytes(),
                batch_no,
            )
        )
        yield from outs

    return fn


def streaming_exact_dedup(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = DOC_SCHEMA,
    ttl_batches: int | None = None,
) -> None:
    """Drain available input once (Trigger.AvailableNow), appending the
    tagged rows to ``out_dir``; state survives across drains through
    the checkpoint, so a doc arriving in a later batch still dedups
    against everything before it (within ``ttl_batches``, if set)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_glob)
        .withColumn("h", F.md5("text"))
        .withColumn("grp", F.substring("h", 1, 2))
    )
    tagged = stream.groupBy("grp").applyInPandasWithState(
        _dedup_fn_factory(ttl_batches),
        _OUT_TYPE,
        _STATE_TYPE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
