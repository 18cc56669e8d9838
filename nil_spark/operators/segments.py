"""Compressed index segments: delta+varint posting blobs with block-max
metadata; three build paths and three query paths, all rank-identical
to the pure-Python oracle:

build — ``build_segments`` (classic: posting relation -> (term, doc_id)
range shuffle -> encode sweep), ``build_partial_segments`` (fused: ONE
Arrow stage does tokenize + per-partition term-major transpose +
vectorized encode; minimal JVM/Python traffic; NIL's partial indexes),
``merge_segments`` (vectorized decode-all/re-encode external merge into
the globally term-sorted store).

query — ``topk_maxscore`` (join segments to the query batch, per-query
MaxScore traversal with block-max skipping: exact, no index residency
assumed), ``topk_maxscore_sharded`` (document-sharded scatter/gather:
shards worker-resident, per-shard top-k, tiny global merge),
``topk_replica_resident`` (replica model: whole decoded index cached
per reused Python worker, query batch partitioned, dense vectorized
scoring — the highest-throughput path when a shard group fits node
memory).

Reference analog: the partial inverted indexes of the partition loop
(/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/NILMain.kt:71-119
and entity/InvertedIndex.kt:10-23; paper §3.2 "partial inverted
indexes") turned into a real external merge: postings are
``repartitionByRange`` on the composite ``(term, doc_id)`` key (each
range partition = one segment, globally sorted term dictionary) and
encoded to binary blobs inside an Arrow ``mapInPandas`` pass — one
sequential sweep per partition, no per-group shuffle.

Skew (north-rule "salted repartition of hot terms"): the salt IS the
``doc_id`` dimension of the composite range key.  A hot term whose
posting list would overflow one partition is split by the range
partitioner across *adjacent* partitions in doc order — equivalent to
salting by doc-range bucket, but with zero extra columns and no
second-stage merge shuffle, because delta-encoded chunks are
self-contained (each blob restarts from its own first doc) and
concatenate back in doc order via ``first_doc``.  Within a partition,
hot terms are additionally *chunked* (``chunk_idx``) so no single row
exceeds ``max_chunk`` postings.

Block-max metadata (``bm_first``/``bm_max``) stores, per block of
``cfg.block_size`` postings, the first doc id and an upper bound on the
BM25 tf-normalization — the posting-resident stats trick of the
reference (InvertedIndex.kt:20 keeps the doc's n-gram count in every
posting) applied to scoring bounds, enabling WAND/MaxScore skipping at
query time without touching doc stats.
"""

from __future__ import annotations

import json
import math
import os
import time
from collections import OrderedDict
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions import varint
from nil_spark.operators import index as index_ops
from nil_spark.operators.query import SCORE_DECIMALS, idf_col, query_terms

SEGMENT_SCHEMA = (
    "term long, chunk_idx int, first_doc long, last_doc long, n_postings long, "
    "doc_blob binary, tf_blob binary, dl_blob binary, "
    "bm_first array<long>, bm_max array<double>"
)

MAXSCORE_MARGIN = 1e-6  # see topk docstring: keeps pruning exact past rounding


def _encode_group(
    term: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    cfg: EngineConfig,
    max_chunk: int,
) -> list[tuple]:
    k1, b = cfg.bm25_k1, cfg.bm25_b
    rows = []
    for ci, lo in enumerate(range(0, len(doc_ids), max_chunk)):
        d = doc_ids[lo : lo + max_chunk]
        t = tfs[lo : lo + max_chunk]
        dl = dls[lo : lo + max_chunk]
        # avgdl-INDEPENDENT upper bound on the tf normalization
        # (dl/avgdl -> 0 maximizes it), so block-max metadata stays a
        # valid bound when the corpus — and hence avgdl — grows after
        # this segment was written (incremental/streaming builds).
        tfn = (t * (k1 + 1.0)) / (t + k1 * (1.0 - b))
        bs = cfg.block_size
        nb = (len(d) + bs - 1) // bs
        bm_first = d[::bs].tolist()
        # upper bound per block: nextafter guards any float directionality
        bm_max = [
            float(np.nextafter(tfn[i * bs : (i + 1) * bs].max(), np.inf))
            for i in range(nb)
        ]
        rows.append(
            (
                int(term),
                ci,
                int(d[0]),
                int(d[-1]),
                len(d),
                varint.encode_deltas(d),
                varint.encode(t.astype(np.uint64)),
                varint.encode(dl.astype(np.uint64)),
                bm_first,
                bm_max,
            )
        )
    return rows


def build_segments(
    postings: DataFrame, cfg: EngineConfig, max_chunk: int = 1 << 20
) -> DataFrame:
    """postings (term, doc_id, tf, dl) -> segment rows (SEGMENT_SCHEMA).

    Plan: range-shuffle on (term, doc_id) (one exchange), sort within
    partition by (term, doc_id), then a single sequential Arrow sweep
    encodes each term run.  The composite range key splits hot terms
    across adjacent partitions in doc order (see module docstring), so
    no partition can be skewed by a hot term; a term's chunks are
    reassembled at query time by ascending ``first_doc``.  Partitions
    are independently encodable and independently checkpointable
    segments.
    """
    p = postings.repartitionByRange(
        cfg.num_segments, "term", "doc_id"
    ).sortWithinPartitions("term", "doc_id")

    def sweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = _SEG_COLS
        cur_term = None
        bufs: list[pd.DataFrame] = []

        def flush():
            docs = np.concatenate([b["doc_id"].to_numpy(np.int64) for b in bufs])
            tfs = np.concatenate([b["tf"].to_numpy(np.float64) for b in bufs])
            dls = np.concatenate([b["dl"].to_numpy(np.float64) for b in bufs])
            return _encode_group(cur_term, docs, tfs, dls, cfg, max_chunk)

        for pdf in it:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            # boundaries of equal-term runs in this Arrow batch
            cuts = np.flatnonzero(np.diff(terms)) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(pdf)]))
            out_rows: list[tuple] = []
            for s, e in zip(starts, ends):
                t = int(terms[s])
                if cur_term is not None and t != cur_term:
                    out_rows.extend(flush())
                    bufs = []
                cur_term = t
                bufs.append(pdf.iloc[s:e])
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)
        if cur_term is not None and bufs:
            yield pd.DataFrame(flush(), columns=cols)

    return p.mapInPandas(sweep, schema=SEGMENT_SCHEMA)


DOCSTAT_SENTINEL = -1  # term ids are md5-prefix63 hashes, always >= 0


def _encode_run_table(
    terms: np.ndarray,
    docs: np.ndarray,
    tfs: np.ndarray,
    dlv: np.ndarray,
    cfg: EngineConfig,
    max_chunk: int,
    presorted: bool = False,
) -> dict:
    """Vectorized chunk/blob/block-max construction over a whole posting
    table at once — one numpy pass, no per-term Python (SURVEY.md §7
    hard part (b)).  Sorts by (term, doc) internally unless the caller
    guarantees that order (``presorted``); returns a column->values
    dict in SEGMENT_SCHEMA order."""
    if not presorted:
        order = np.lexsort((docs, terms))
        terms, tfs, docs, dlv = terms[order], tfs[order], docs[order], dlv[order]
    cuts = np.flatnonzero(np.diff(terms)) + 1
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts, [len(terms)]))

    run_lens = ends - starts
    reps = (run_lens + max_chunk - 1) // max_chunk
    rep_off = np.concatenate(([0], np.cumsum(reps)[:-1]))
    chunk_run = np.repeat(np.arange(len(starts)), reps)
    pos_in_run = np.arange(len(chunk_run)) - rep_off[chunk_run]
    c_starts = starts[chunk_run] + pos_in_run * max_chunk
    c_ends = np.minimum(c_starts + max_chunk, ends[chunk_run])
    n_post = c_ends - c_starts
    nc = len(c_starts)

    # delta gaps, reset to absolute at every chunk start (negative
    # diffs at run boundaries wrap as uint64 but are overwritten)
    gaps = np.empty(len(docs), dtype=np.uint64)
    gaps[1:] = (docs[1:] - docs[:-1]).astype(np.uint64)
    gaps[c_starts] = docs[c_starts].astype(np.uint64)

    def bufs_and_offsets(vals: np.ndarray):
        off = np.zeros(len(vals) + 1, dtype=np.int64)
        off[1:] = np.cumsum(varint.byte_lengths(vals))
        return varint.encode(vals), off

    doc_buf, doc_off = bufs_and_offsets(gaps)
    tf_buf, tf_off = bufs_and_offsets(tfs.astype(np.uint64))
    dl_buf, dl_off = bufs_and_offsets(dlv.astype(np.uint64))

    k1, b = cfg.bm25_k1, cfg.bm25_b
    bs = cfg.block_size
    bpc = (n_post + bs - 1) // bs
    b_off = np.concatenate(([0], np.cumsum(bpc)))
    blk_chunk = np.repeat(np.arange(nc), bpc)
    pos_in_chunk = np.arange(len(blk_chunk)) - b_off[:-1][blk_chunk]
    blk_starts = c_starts[blk_chunk] + pos_in_chunk * bs
    tfn = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b))
    bmax = np.nextafter(np.maximum.reduceat(tfn, blk_starts), np.inf)
    bfirst = docs[blk_starts]

    return {
        "term": terms[c_starts],
        "chunk_idx": pos_in_run.astype(np.int32),
        "first_doc": docs[c_starts],
        "last_doc": docs[c_ends - 1],
        "n_postings": n_post,
        "doc_blob": [doc_buf[doc_off[s]:doc_off[e]] for s, e in zip(c_starts, c_ends)],
        "tf_blob": [tf_buf[tf_off[s]:tf_off[e]] for s, e in zip(c_starts, c_ends)],
        "dl_blob": [dl_buf[dl_off[s]:dl_off[e]] for s, e in zip(c_starts, c_ends)],
        "bm_first": [bfirst[b_off[i]:b_off[i + 1]].tolist() for i in range(nc)],
        "bm_max": [bmax[b_off[i]:b_off[i + 1]].tolist() for i in range(nc)],
    }


def _decode_chunk_table(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized inverse of :func:`_encode_run_table` over a chunk-row
    table: one concatenated varint decode per stream, then a segmented
    cumsum converts gap streams back to absolute doc ids.  Returns
    per-posting (terms, docs, tfs, dls)."""
    n_post = pdf["n_postings"].to_numpy(np.int64)
    c_off = np.concatenate(([0], np.cumsum(n_post)))
    doc_buf = b"".join(bytes(x) for x in pdf["doc_blob"])
    tf_buf = b"".join(bytes(x) for x in pdf["tf_blob"])
    dl_buf = b"".join(bytes(x) for x in pdf["dl_blob"])
    gaps = varint.decode(doc_buf).astype(np.int64)
    tfs = varint.decode(tf_buf).astype(np.float64)
    dls = varint.decode(dl_buf).astype(np.float64)
    csum = np.cumsum(gaps)
    cs = c_off[:-1]
    # per chunk: docs = first_doc + (csum - csum[cs]); gaps[cs] is the
    # absolute first doc, so correction = csum[cs] - gaps[cs]
    corr = np.repeat(csum[cs] - gaps[cs], n_post)
    docs = csum - corr
    terms = np.repeat(pdf["term"].to_numpy(np.int64), n_post)
    return terms, docs, tfs, dls


def merge_segments(
    chunked: DataFrame, cfg: EngineConfig, max_chunk: int = 1 << 20
) -> DataFrame:
    """External merge of self-contained chunks into consolidated
    term-runs: range-partition by (term, first_doc) — the globally
    term-sorted store — then per partition decode-all + re-encode in
    one vectorized pass (reference analog: the partition-loop merge of
    NILMain.kt:71-119).  Consolidation matters for query latency:
    fan-in from P partial builds leaves ~P chunks per term, and the
    per-chunk overhead of the MaxScore traversal is per-row Python."""
    p = chunked.repartitionByRange(
        cfg.num_segments, "term", "first_doc"
    ).sortWithinPartitions("term", "first_doc")

    def msweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in it if len(pdf)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        terms, docs, tfs, dls = _decode_chunk_table(whole)
        yield pd.DataFrame(_encode_run_table(terms, docs, tfs, dls, cfg, max_chunk))

    return p.mapInPandas(msweep, schema=SEGMENT_SCHEMA)


def build_partial_segments(
    docs_with_ids: DataFrame, cfg: EngineConfig, max_chunk: int = 1 << 20
) -> DataFrame:
    """Single-pass fused build: text -> tokenize -> per-partition
    term-major transpose -> compressed chunk rows, in ONE Arrow stage.

    Reference analog: the per-partition partial inverted indexes of
    NILMain.kt:71-87 / InvertedIndex.kt:10-23, built in one sweep of the
    partition's docs.  Compared to the explode -> shuffle -> encode
    pipeline, the only bytes that cross the JVM/Python boundary are the
    input text and the compressed output blobs (~5-10x less Arrow
    traffic), and the pre-Python posting shuffle disappears entirely —
    on hosts/clusters where the Python channel is the scarce resource
    this is the difference between a flat and a scaling build.

    Output: SEGMENT_SCHEMA rows, many chunks per term (one per doc
    partition it occurs in; chunks are self-contained and doc-disjoint
    ONLY if the input is doc-range partitioned — topk_maxscore does not
    require disjointness).  One sentinel row per partition
    (term = DOCSTAT_SENTINEL) carries the partition's docstats:
    n_postings = n_docs, doc_blob = varint doc ids, dl_blob = varint
    dls, bm_max = [sum dl] — so corpus stats need no second pass.
    """
    def sweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it if len(p)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        out = _fused_partition_frame(whole, cfg, max_chunk)
        if out is not None:
            yield out

    return docs_with_ids.select("doc_id", "text").mapInPandas(
        sweep, schema=SEGMENT_SCHEMA
    )


_SEG_COLS = [
    "term", "chunk_idx", "first_doc", "last_doc", "n_postings",
    "doc_blob", "tf_blob", "dl_blob", "bm_first", "bm_max",
]


def _transpose_tokens(
    toks_list: list, ids: np.ndarray, dls: np.ndarray, cfg: EngineConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fully vectorized token → (term, doc, tf, dl) posting transpose.

    One ``pd.factorize`` over the flat token stream (each *unique*
    token is hashed exactly once — the vocabulary is Zipfian, so this
    replaces millions of per-token cache lookups with thousands), a
    globally vectorized rolling n-gram hash with doc-boundary masking,
    and ONE (term, doc) lexsort that both aggregates tf and leaves the
    arrays in the exact order ``_encode_run_table`` needs.  Replaces a
    per-doc Python loop (np.unique + np.full per doc) that dominated
    the build kernel profile.
    """
    from itertools import chain

    from nil_spark.functions.tokenize import _hash_token

    flat = np.asarray(list(chain.from_iterable(toks_list)), dtype=object)
    if len(flat) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z.astype(np.float64), z.astype(np.float64)
    codes, uniques = pd.factorize(flat)
    uh = np.fromiter(
        (_hash_token(u) for u in uniques), dtype=np.int64, count=len(uniques)
    )
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), dls)
    tok_h = uh[codes]
    n = cfg.gram_size
    if n > 1:
        # rolling polynomial hash over the flat stream; windows that
        # cross a doc boundary are masked out (identical math to
        # ngram_hashes_np, uint64 wraparound)
        from nil_spark.functions.hashing import MASK63, POLY_P

        m = len(tok_h) - n + 1
        if m <= 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z.astype(np.float64), z.astype(np.float64)
        with np.errstate(over="ignore"):
            acc = np.zeros(m, dtype=np.uint64)
            p = np.uint64(POLY_P)
            th64 = tok_h.astype(np.uint64)
            for i in range(n):
                acc = acc * p + th64[i : i + m]
        valid = doc_idx[:m] == doc_idx[n - 1 :]
        tok_h = (acc & np.uint64(MASK63)).astype(np.int64)[valid]
        doc_idx = doc_idx[:m][valid]
    if len(tok_h) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z.astype(np.float64), z.astype(np.float64)
    # one global (term-major, doc within term) sort = tf aggregation AND
    # the exact ordering _encode_run_table requires
    order = np.lexsort((doc_idx, tok_h))
    t2, d2 = tok_h[order], doc_idx[order]
    newgrp = np.empty(len(t2), dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (t2[1:] != t2[:-1]) | (d2[1:] != d2[:-1])
    starts = np.flatnonzero(newgrp)
    tf = np.diff(np.append(starts, len(t2))).astype(np.float64)
    if cfg.distinct_ngrams:
        tf = np.ones(len(starts), dtype=np.float64)
    gd = d2[starts]
    return t2[starts], ids[gd], tf, dls[gd].astype(np.float64)


def _fused_partition_frame(
    pdf: pd.DataFrame, cfg: EngineConfig, max_chunk: int
) -> pd.DataFrame | None:
    """The fused-build kernel over one in-memory doc partition
    ``(doc_id, text)``: min-size scan predicates → tokenize →
    vectorized term-major transpose → vectorized encode + docstats
    sentinel.  Shared by the Arrow-channel path (build_partial_segments)
    and the file-direct path (build_partial_segments_from_files)."""
    from nil_spark.functions.tokenize import tokenize_series

    # the encoder's chunk metadata ([first_doc, last_doc] skip-list
    # bounds) and delta compression require ascending doc ids within
    # the partition; an upstream repartition() scrambles row order, so
    # sort here — without this, chunks decode fine but their range
    # bounds are garbage and MaxScore's range skip silently drops
    # score updates (caught by the e2e property fuzz)
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    if cfg.min_chars > 0:  # same scan predicate as with_term_counts
        # (threshold 1 drops empty texts — oracle >= semantics)
        pdf = pdf[pdf["text"].fillna("").str.len() >= cfg.min_chars]
    toks = tokenize_series(pdf["text"], cfg)
    ids = pdf["doc_id"].to_numpy(np.int64)
    dls = np.fromiter((len(ts) for ts in toks), dtype=np.int64, count=len(pdf))
    toks_list = toks.tolist()
    if cfg.min_tokens > 0:
        keep = dls >= cfg.min_tokens
        toks_list = [t for t, k in zip(toks_list, keep) if k]
        kids, kdls = ids[keep], dls[keep]
    else:
        kids, kdls = ids, dls
    terms, docs, tfs, dlv = _transpose_tokens(toks_list, kids, kdls, cfg)
    if len(terms) == 0 and len(kids) == 0:
        return None
    rows = _encode_run_table(terms, docs, tfs, dlv, cfg, max_chunk, presorted=True)
    # docstats sentinel covers only docs that pass the min-size
    # predicates (filtered docs must not inflate n_docs/avgdl)
    pdocs, pdls = kids, kdls
    o = np.argsort(pdocs, kind="stable")
    pdocs, pdls = pdocs[o], pdls[o]
    sentinel = pd.DataFrame(
        [
            (
                DOCSTAT_SENTINEL,
                0,
                int(pdocs[0]) if len(pdocs) else 0,
                int(pdocs[-1]) if len(pdocs) else 0,
                len(pdocs),
                varint.encode_deltas(pdocs),
                b"",
                varint.encode(pdls.astype(np.uint64)),
                [],
                [float(pdls.sum())],
            )
        ],
        columns=_SEG_COLS,
    )
    return pd.concat(
        [pd.DataFrame(rows, columns=_SEG_COLS), sentinel], ignore_index=True
    )


def _file_offsets_validated(
    file_paths: list[str], order_cols: tuple
) -> list[int]:
    """Per-file starting doc-id offsets (cumulative row counts) for the
    file-direct builds, from footer-only metadata reads — no data I/O —
    plus the range-layout validation both builds require: min/max
    footer stats of the leading order column must be non-overlapping
    ascending across files (boundary *equality* allowed — see
    build_partial_segments_from_files)."""
    import pyarrow.parquet as pq

    offsets = []
    acc = 0
    ranges = []  # (min, max) of order_cols[0] per file, from footer stats
    for p in file_paths:
        offsets.append(acc)
        md = pq.ParquetFile(p).metadata
        acc += md.num_rows
        col0 = order_cols[0]
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(col0) if col0 in names else -1
        fmin = fmax = None
        if ci >= 0:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    fmin = fmax = None
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        ranges.append((fmin, fmax))
    for i in range(len(ranges) - 1):
        mx, nmin = ranges[i][1], ranges[i + 1][0]
        if mx is not None and nmin is not None and mx > nmin:
            raise ValueError(
                f"file-direct build precondition violated: {file_paths[i]} "
                f"max({order_cols[0]})={mx!r} overlaps {file_paths[i + 1]} "
                f"min={nmin!r}; files must be globally range-sorted on "
                f"{order_cols} (write with repartitionByRange + "
                f"sortWithinPartitions), or use build_partial_segments"
            )
    return offsets


def build_partial_segments_from_files(
    spark: SparkSession,
    file_paths: list[str],
    cfg: EngineConfig,
    max_chunk: int = 1 << 20,
    order_cols: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """File-direct fused build: ONE task per input parquet file; the
    Python worker reads the file itself (pyarrow), so no text ever
    crosses the JVM→Python Arrow channel — the only channel traffic is
    the compressed segment blobs coming back.  On a real cluster each
    worker reads its file straight from the object store, exactly like
    an Iceberg scan task.

    Precondition: the files are globally range-sorted on ``order_cols``
    — file i holds a contiguous key range below file i+1's (the
    standard sorted-write / Iceberg sort-order layout).  Doc ids are
    then ``file_row_offset + within-file rank``, bit-identical to
    ``assign_doc_ids`` over the same ordering; rows inside a file are
    sorted here, so only the file-level range layout is assumed.  The
    layout IS validated here from the parquet footers (min/max stats of
    the leading order column must be non-overlapping ascending across
    files) — a violated layout would silently diverge doc ids from
    ``assign_doc_ids`` and corrupt every query result.  Boundary
    *equality* (one key straddling a file split, as repartitionByRange
    legitimately produces) is allowed: footer stats cannot distinguish
    it from disorder, and it preserves global tuple order.

    Reference analog: the partition loop building partial inverted
    indexes per doc range (NILMain.kt:71-87) with the doc range = one
    input file.
    """
    import pyarrow.parquet as pq

    offsets = _file_offsets_validated(file_paths, order_cols)
    meta = spark.createDataFrame(
        [(p, o) for p, o in zip(file_paths, offsets)], "path string, offset long"
    ).repartition(len(file_paths), "path")

    ocols = list(order_cols)

    def sweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for mpdf in it:
            for path, off in zip(mpdf["path"], mpdf["offset"]):
                t = (
                    pq.read_table(path, columns=[*ocols, "text"])
                    .to_pandas()
                    .sort_values(ocols, kind="mergesort")
                )
                part = pd.DataFrame(
                    {
                        "doc_id": np.arange(off, off + len(t), dtype=np.int64),
                        "text": t["text"].to_numpy(),
                    }
                )
                out = _fused_partition_frame(part, cfg, max_chunk)
                if out is not None:
                    yield out

    return meta.mapInPandas(sweep, schema=SEGMENT_SCHEMA)


# pyarrow schema the direct-write build pins its shard files to —
# byte-compatible with what Spark's parquet writer produces for
# SEGMENT_SCHEMA rows, so every downstream reader (spark.read.parquet,
# publish_replica, _load_replica's pq.read_table) sees one shard
# format regardless of which build wrote it.
def _segment_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("term", pa.int64()),
            ("chunk_idx", pa.int32()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
            ("n_postings", pa.int64()),
            ("doc_blob", pa.binary()),
            ("tf_blob", pa.binary()),
            ("dl_blob", pa.binary()),
            ("bm_first", pa.list_(pa.int64())),
            ("bm_max", pa.list_(pa.float64())),
        ]
    )


def build_segment_store_files_direct(
    spark: SparkSession,
    file_paths: list[str],
    cfg: EngineConfig,
    out_dir: str,
    max_chunk: int = 1 << 20,
    order_cols: tuple = ("conv_id", "turn_idx"),
    write_stats: bool = True,
) -> pd.DataFrame:
    """File-direct build with file-direct OUTPUT: one task per input
    parquet file; the Python worker reads its file itself (pyarrow),
    runs the fused encode, and writes the finished shard parquet
    ``out_dir/part-NNNNN.parquet`` itself (pyarrow, snappy — the same
    physical format Spark's writer produces).  The JVM→Python channel
    carries NOTHING but a one-row manifest per file: on a single box
    that removes the Arrow return transfer of every compressed blob
    plus the JVM parquet re-encode; on a real cluster it is exactly the
    write topology an Iceberg/parquet table sink uses — each executor
    streams its own output file to the object store, and only commit
    metadata flows back to the driver.

    Same precondition + docID assignment as
    ``build_partial_segments_from_files`` (globally range-sorted files,
    doc_id = file row offset + within-file rank — validated from the
    parquet footers).  Empty shards (every doc filtered by the min-size
    predicates) write no file.  Runs eagerly; returns the manifest as a
    pandas frame ``(path, shard, n_rows)`` sorted by shard index.

    With ``write_stats`` (default), each task also writes an
    Iceberg-stats-file-style side-car ``_stats/part-NNNNN.parquet``
    holding the shard's per-term df partials plus its docstat sentinel
    (n_docs / Σdl) — vocabulary-sized, ~1000× smaller than the shard.
    :func:`read_store_stats` then derives the global term dictionary
    and corpus stats from the side-cars alone, without a second
    full-store Spark aggregation.  The ``_`` prefix keeps directory-
    level parquet readers (Spark convention: hidden) off the side-cars.

    Reference analog: NILMain.kt:71-87's per-partition partial-index
    loop, with the partition's output persisted by the worker that
    built it rather than funneled through a central writer.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    offsets = _file_offsets_validated(file_paths, order_cols)
    os.makedirs(out_dir, exist_ok=True)
    stats_dir = os.path.join(out_dir, "_stats")
    if write_stats:
        os.makedirs(stats_dir, exist_ok=True)
    # one meta row PER PARTITION via parallelize(n_slices=n_files): the
    # whole build is then a single shuffle-free stage (a hash
    # repartition here would add a stage barrier + tiny shuffle whose
    # fixed cost taxes exactly the high-parallelism level)
    rows = [(p, int(o), i) for i, (p, o) in enumerate(zip(file_paths, offsets))]
    meta = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, len(rows)),
        "path string, offset long, shard int",
    )

    ocols = list(order_cols)
    arrow_schema = _segment_arrow_schema()
    stats_schema = pa.schema(
        [("term", pa.int64()), ("df", pa.int64()), ("sdl", pa.float64())]
    )
    man_schema = "path string, shard int, n_rows long"

    def sweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for mpdf in it:
            for path, off, shard in zip(
                mpdf["path"], mpdf["offset"], mpdf["shard"]
            ):
                t = (
                    pq.read_table(path, columns=[*ocols, "text"])
                    .to_pandas()
                    .sort_values(ocols, kind="mergesort")
                )
                part = pd.DataFrame(
                    {
                        "doc_id": np.arange(off, off + len(t), dtype=np.int64),
                        "text": t["text"].to_numpy(),
                    }
                )
                out = _fused_partition_frame(part, cfg, max_chunk)
                if out is None:
                    continue
                dest = os.path.join(out_dir, f"part-{int(shard):05d}.parquet")
                tbl = pa.Table.from_pandas(
                    out, schema=arrow_schema, preserve_index=False
                )
                # write-then-rename so a killed/retried task never
                # leaves a torn shard behind under the final name
                tmp = f"{dest}.inprogress.{os.getpid()}"
                pq.write_table(tbl, tmp, compression="snappy")
                os.replace(tmp, dest)
                if write_stats:
                    # per-term df partials (one posting row per doc, so
                    # df = Σ n_postings over the term's chunks) + the
                    # docstat sentinel (df = n_docs, sdl = Σ dl)
                    g = out.groupby("term", sort=False)["n_postings"].sum()
                    sdl = np.zeros(len(g), dtype=np.float64)
                    sent_pos = np.flatnonzero(
                        g.index.to_numpy(np.int64) == DOCSTAT_SENTINEL
                    )
                    if len(sent_pos):
                        srow = out[out["term"] == DOCSTAT_SENTINEL]
                        sdl[sent_pos[0]] = float(srow["bm_max"].iloc[0][0])
                    stats = pd.DataFrame(
                        {
                            "term": g.index.to_numpy(np.int64),
                            "df": g.to_numpy(np.int64),
                            "sdl": sdl,
                        }
                    )
                    sdest = os.path.join(
                        stats_dir, f"part-{int(shard):05d}.parquet"
                    )
                    stmp = f"{sdest}.inprogress.{os.getpid()}"
                    pq.write_table(
                        pa.Table.from_pandas(
                            stats, schema=stats_schema, preserve_index=False
                        ),
                        stmp, compression="snappy",
                    )
                    os.replace(stmp, sdest)
                yield pd.DataFrame(
                    {"path": [dest], "shard": [int(shard)], "n_rows": [len(out)]}
                )

    manifest = (
        meta.mapInPandas(sweep, schema=man_schema)
        .toPandas()
        .sort_values("shard", kind="mergesort")
        .reset_index(drop=True)
    )
    return manifest


# side-car merge sizes above which the driver hands the aggregation to
# a (tiny) Spark job over the _stats files instead of merging locally:
# the local merge is O(vocab × shards) rows, fine for hundreds of
# shards of a word vocabulary, not for thousands of shards at 10^7+
# vocab (that product approaches posting scale)
STATS_LOCAL_MERGE_MAX_ROWS = 50_000_000


def read_store_stats(
    out_dir: str,
    cfg: EngineConfig,
    spark: SparkSession | None = None,
) -> tuple[int, float, pd.DataFrame]:
    """Global corpus stats + pruned term dictionary from the per-shard
    ``_stats`` side-cars a direct-write build leaves behind — the
    second full-store aggregation pass (`read store → groupBy term`)
    replaced by a merge over vocabulary-sized partials.

    Returns ``(n_docs, avgdl, termdict)`` with ``termdict`` a pandas
    ``(term, df)`` frame already df-stopword-pruned per ``cfg`` — the
    exact inputs the serving paths take.  Merges locally (pyarrow +
    one pandas groupby, no Spark job) while the total partial-row count
    is bounded; beyond ``STATS_LOCAL_MERGE_MAX_ROWS`` it requires
    ``spark`` and runs one tiny aggregation over the side-car files —
    still ~1000× less data than re-reading the shard store."""
    import glob as _glob

    import pyarrow.parquet as pq

    paths = sorted(_glob.glob(os.path.join(out_dir, "_stats", "part-*.parquet")))
    if not paths:
        raise FileNotFoundError(
            f"no _stats side-cars under {out_dir} — build with "
            f"build_segment_store_files_direct(write_stats=True), or "
            f"derive stats from the store with index_from_partial_segments"
        )
    total_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    if total_rows > STATS_LOCAL_MERGE_MAX_ROWS:
        if spark is None:
            raise ValueError(
                f"{total_rows} stat partial rows exceed the local-merge "
                f"bound {STATS_LOCAL_MERGE_MAX_ROWS}; pass spark= to "
                f"aggregate the side-cars distributed"
            )
        agg = (
            spark.read.parquet(*paths)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"),
                 F.sum("sdl").alias("sdl"))
        ).toPandas()
    else:
        frames = [pq.read_table(p).to_pandas() for p in paths]
        allp = pd.concat(frames, ignore_index=True)
        agg = (
            allp.groupby("term", sort=False)
            .agg(df=("df", "sum"), sdl=("sdl", "sum"))
            .reset_index()
        )
    sent = agg[agg["term"] == DOCSTAT_SENTINEL]
    n_docs = int(sent["df"].sum())
    avgdl = float(sent["sdl"].sum()) / max(n_docs, 1)
    termdict = agg[agg["term"] != DOCSTAT_SENTINEL][["term", "df"]]
    cutoff = cfg.df_stopword_cutoff
    if cutoff is not None and cutoff < 1.0:
        termdict = termdict[termdict["df"] <= int(cutoff * n_docs)]
    return n_docs, avgdl, termdict.reset_index(drop=True)


def build_index_fused(docs_with_ids: DataFrame, cfg: EngineConfig) -> dict:
    """Fused single-Python-pass index build + JVM-only external merge.

    Returns the same handle shape topk_maxscore consumes:
    {segments, termdict, docstats(blobs), n_docs, avgdl}.  The external
    merge into a globally term-sorted store is a pure-JVM
    repartitionByRange over self-contained chunk rows — no decode, no
    second Python pass (reference analog: the partition-loop merge of
    NILMain.kt:71-119 as a sort of compressed runs).
    """
    return index_from_partial_segments(
        build_partial_segments(docs_with_ids, cfg).persist(), cfg
    )


def index_from_partial_segments(raw: DataFrame, cfg: EngineConfig) -> dict:
    """Partial-segment rows (with docstat sentinels) → queryable index
    handle: corpus stats from the sentinels, term dictionary, stopword
    pruning, external merge."""
    sent = raw.filter(F.col("term") == DOCSTAT_SENTINEL)
    segs = raw.filter(F.col("term") != DOCSTAT_SENTINEL)

    stats = sent.agg(
        F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
    ).collect()[0]
    n_docs = int(stats["n"])
    avgdl = float(stats["s"]) / max(n_docs, 1)

    termdict = segs.groupBy("term").agg(
        F.sum("n_postings").cast("long").alias("df")
    ).persist()

    cutoff = cfg.df_stopword_cutoff
    if cutoff is not None and cutoff < 1.0:
        stop = termdict.filter(F.col("df") > int(cutoff * n_docs)).select("term")
        segs = segs.join(F.broadcast(stop), "term", "left_anti")

    merged = merge_segments(segs, cfg)
    return {
        "segments": merged,
        "termdict": termdict,
        "docstats_blobs": sent,
        "n_docs": n_docs,
        "avgdl": avgdl,
    }


def decode_postings(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """segment row -> (doc_ids int64, tf f64, dl f64) — test/debug helper."""
    return (
        varint.decode_deltas(bytes(row["doc_blob"])),
        varint.decode(bytes(row["tf_blob"])).astype(np.float64),
        varint.decode(bytes(row["dl_blob"])).astype(np.float64),
    )


# --------------------------------------------------------------- query


def topk_maxscore(
    queries: DataFrame,
    segments: DataFrame,
    termdict: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """Exact BM25 top-k over compressed segments with MaxScore pruning.

    Reference analog: location + filtration (NGramBasedLocation.kt:10-16,
    NGramBasedFiltration.kt:6-12) — the cheap bound that keeps the
    expensive work off most candidates — reborn as document-pruning with
    posting upper bounds.

    Exactness argument: terms are processed in descending upper bound
    ``ub = idf·max(bm_max)``.  Once the sum of remaining ubs is below
    the current kth score minus MAXSCORE_MARGIN, an unseen doc can never
    reach the top-k, so remaining terms only update already-seen docs
    (whose scores stay exact).  Three chunk-level prunes, all exact:

    * pre-intersect, once k candidates exist, a chunk whose block-max
      bound ``idf·max(bm_max) + rem`` cannot reach the running kth is
      decoded *update-only* (unseen docs in it can never enter the
      top-k: their total ≤ bound < kth_now ≤ kth_final, and kth_now is a
      lower bound on the true kth because partial scores never
      overestimate) — and skipped entirely when its ``[first_doc,
      last_doc]`` range holds no accumulated doc;
    * in intersect mode, chunks whose range holds no accumulated doc
      are skipped without decoding (range skip via the chunk skip-list
      bounds, not just the max accumulated doc);
    * in intersect mode, accumulated docs whose score + remaining bound
      cannot reach the kth are dropped (candidate pruning), shrinking
      both the update cost and the surviving chunk set.

    Final scores are rounded to SCORE_DECIMALS before ranking, ties by
    ascending doc_id — identical to the DataFrame path (query.py).
    """
    k1, b = cfg.bm25_k1, cfg.bm25_b
    qt = query_terms(queries, cfg)
    qt = qt.join(termdict.select("term", "df"), "term", "inner")
    qt = qt.select("term", "query_id", "k", idf_col(F.col("df"), n_docs).alias("idf"))

    joined = segments.join(F.broadcast(qt), "term", "inner").select(
        "query_id", "k", "term", "first_doc", "last_doc", "idf",
        "doc_blob", "tf_blob", "dl_blob", "bm_first", "bm_max", "n_postings",
    )

    def per_query(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        k = int(pdf["k"].iloc[0])
        # group chunks per term ONCE (a per-term boolean-mask rescan is
        # O(T^2) in query terms), order terms by descending upper bound
        groups = {term: g for term, g in pdf.groupby("term")}
        idfs = {term: float(g["idf"].iloc[0]) for term, g in groups.items()}
        ubs = {
            term: idfs[term] * max(max(bm) for bm in g["bm_max"])
            for term, g in groups.items()
        }
        order = sorted(ubs, key=lambda t: -ubs[t])
        rem = sum(ubs.values())

        acc_docs = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        intersect = False

        def update_only(g_upd, idf):
            # add contributions to already-seen docs only
            _, d, tf, dl = _decode_chunk_table(g_upd)
            contrib = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            pos = np.searchsorted(acc_docs, d)
            pos_ok = pos < len(acc_docs)
            hit = np.zeros(len(d), dtype=bool)
            hit[pos_ok] = acc_docs[pos[pos_ok]] == d[pos_ok]
            np.add.at(acc_scores, pos[hit], contrib[hit])

        for term in order:
            rem -= ubs[term]
            g = groups[term].sort_values("first_doc")
            idf = idfs[term]
            kth = (
                np.partition(acc_scores, -k)[-k] if len(acc_docs) >= k else -np.inf
            )
            if intersect:
                # candidate pruning: a doc whose score plus everything it
                # could still gain (this term's ub + rem) can't reach the
                # kth will never be in the top-k
                keep = acc_scores + (ubs[term] + rem + MAXSCORE_MARGIN) >= kth
                if not keep.all():
                    acc_docs, acc_scores = acc_docs[keep], acc_scores[keep]
                # range skip: drop chunks whose [first_doc, last_doc]
                # holds no surviving candidate
                firsts = g["first_doc"].to_numpy(np.int64)
                lasts = g["last_doc"].to_numpy(np.int64)
                lo = np.searchsorted(acc_docs, firsts, side="left")
                hi = np.searchsorted(acc_docs, lasts, side="right")
                g = g[hi > lo]
                if len(g):
                    update_only(g, idf)
                continue

            g_full = g
            if np.isfinite(kth):
                # block-max bound per chunk: unseen docs in a failing
                # chunk can never reach the top-k → update-only; and a
                # failing chunk with no accumulated doc in range → skip
                cmax = np.fromiter(
                    (max(bm) for bm in g["bm_max"]), dtype=np.float64, count=len(g)
                )
                bound_ok = idf * cmax + rem + MAXSCORE_MARGIN >= kth
                if not bound_ok.all():
                    firsts = g["first_doc"].to_numpy(np.int64)
                    lasts = g["last_doc"].to_numpy(np.int64)
                    lo = np.searchsorted(acc_docs, firsts, side="left")
                    hi = np.searchsorted(acc_docs, lasts, side="right")
                    g_upd = g[~bound_ok & (hi > lo)]
                    g_full = g[bound_ok]
                    if len(g_upd):
                        update_only(g_upd, idf)
            if len(g_full):
                # ONE batched decode for all surviving chunks of this
                # term (concatenated varint streams + segmented cumsum);
                # (term, doc) pairs are unique across chunks, so a
                # single accumulate is exact
                _, d, tf, dl = _decode_chunk_table(g_full)
                contrib = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl)
                )
                all_docs = np.concatenate((acc_docs, d))
                all_sc = np.concatenate((acc_scores, contrib))
                acc_docs, inv = np.unique(all_docs, return_inverse=True)
                acc_scores = np.zeros(len(acc_docs), dtype=np.float64)
                np.add.at(acc_scores, inv, all_sc)
            if len(acc_docs) >= k:
                kth = np.partition(acc_scores, -k)[-k]
                if rem + MAXSCORE_MARGIN < kth:
                    intersect = True

        if len(acc_docs) == 0:
            return pd.DataFrame(columns=["query_id", "rank", "doc_id", "bm25"]).astype(
                {"query_id": "int64", "rank": "int32", "doc_id": "int64", "bm25": "float64"}
            )
        scores = np.round(acc_scores, SCORE_DECIMALS)
        order_idx = np.lexsort((acc_docs, -scores))[:k]
        return pd.DataFrame(
            {
                "query_id": np.int64(qid),
                "rank": np.arange(1, len(order_idx) + 1, dtype=np.int32),
                "doc_id": acc_docs[order_idx],
                "bm25": scores[order_idx],
            }
        )

    return joined.groupBy("query_id").applyInPandas(
        per_query, schema="query_id long, rank int, doc_id long, bm25 double"
    )


# ------------------------------------------------- checkpointed build


# ---------------------------------------------- sharded query engine

# per-worker shard cache: (path, scoring key) -> {term: (docs int64,
# tfn float64)} with the BM25 tf-normalization PRE-computed at load, so
# a query-term touch is one slice + one multiply.  Python workers are
# reused across jobs (spark.python.worker.reuse=true), so a shard is
# read and decoded ONCE per worker per index version — the Spark analog
# of an index shard resident on its search node.  LRU with per-entry
# eviction (an earlier wholesale clear() evicted still-hot shards).
_SHARD_CACHE: OrderedDict = OrderedDict()
_SHARD_CACHE_MAX = 64


def _decode_shard_arrays(path: str, avgdl: float, k1: float, b: float):
    """Read + decode one shard file into the flat 4-array layout
    (unique sorted terms, offsets, concatenated docs/tfn)."""
    import pyarrow.parquet as pq

    pdf = pq.read_table(
        path, columns=["term", "n_postings", "doc_blob", "tf_blob", "dl_blob"]
    ).to_pandas()
    pdf = pdf[pdf["term"] != DOCSTAT_SENTINEL].reset_index(drop=True)
    terms, docs, tfs, dls = _decode_chunk_table(pdf)
    tfn = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    # one vectorized (term, doc) sort, then per-term offset ranges
    order = np.lexsort((docs, terms))
    terms, docs, tfn = terms[order], docs[order], tfn[order]
    cuts = np.flatnonzero(np.diff(terms)) + 1
    starts = np.concatenate(([0], cuts)) if len(terms) else np.empty(0, np.int64)
    uterms = terms[starts] if len(terms) else np.empty(0, np.int64)
    offs = np.concatenate((starts, [len(terms)])).astype(np.int64)
    return uterms, offs, docs, tfn


def _decode_shard_arrays_lmd(path: str):
    """Read + decode one shard file into the flat RAW layout
    (unique sorted terms, offsets, concatenated docs/tf/dl) — no BM25
    transform, for similarity modules that need raw statistics (LM
    Dirichlet)."""
    import pyarrow.parquet as pq

    pdf = pq.read_table(
        path, columns=["term", "n_postings", "doc_blob", "tf_blob", "dl_blob"]
    ).to_pandas()
    pdf = pdf[pdf["term"] != DOCSTAT_SENTINEL].reset_index(drop=True)
    terms, docs, tfs, dls = _decode_chunk_table(pdf)
    order = np.lexsort((docs, terms))
    terms, docs, tfs, dls = terms[order], docs[order], tfs[order], dls[order]
    cuts = np.flatnonzero(np.diff(terms)) + 1
    starts = np.concatenate(([0], cuts)) if len(terms) else np.empty(0, np.int64)
    uterms = terms[starts] if len(terms) else np.empty(0, np.int64)
    offs = np.concatenate((starts, [len(terms)])).astype(np.int64)
    return uterms, offs, docs, tfs.astype(np.float64), dls.astype(np.float64)


def _load_shard(path: str, avgdl: float, k1: float, b: float):
    """Node-shared shard attach: same publish-once/mmap-everywhere
    store as the replica path, per shard file.  The worker-level LRU
    holds cheap mmap views, not decoded copies — N workers serving the
    same shard cost ONE physical copy per node."""
    key = (path, round(avgdl, 9), k1, b)
    ent = _SHARD_CACHE.get(key)
    if ent is not None:
        _SHARD_CACHE.move_to_end(key)
        return ent
    shard = _ReplicaView(
        *_published_arrays(
            ("shard", key), (path,), lambda: _decode_shard_arrays(path, avgdl, k1, b)
        )
    )
    _SHARD_CACHE[key] = shard
    while len(_SHARD_CACHE) > _SHARD_CACHE_MAX:
        _SHARD_CACHE.popitem(last=False)
    return shard


def topk_maxscore_sharded(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list[str],
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """Document-sharded BM25 top-k: scatter the query batch to every
    shard, per-shard MaxScore top-k against the worker-resident shard,
    gather with a tiny global merge.

    This is the classic document-partitioned search topology (each doc
    lives in exactly one shard, so per-doc scores are exact with global
    idf; the union of per-shard top-k contains the global top-k).  The
    only shuffle is shards×k result rows — query execution never moves
    or duplicates posting data, unlike the join-based topk_maxscore.

    queries_pdf: (query_id, text, k) pandas; termdict_pdf: (term, df)
    GLOBAL df (already stopword-pruned).  shard_paths: parquet files of
    build_partial_segments output (one file = one doc shard).
    """
    from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series

    k1, b = cfg.bm25_k1, cfg.bm25_b
    df_map = dict(zip(termdict_pdf["term"].astype(np.int64), termdict_pdf["df"].astype(np.int64)))

    # query-side tokenize once on the driver (query batch is small)
    qtoks = tokenize_series(queries_pdf["text"], cfg)
    queries = []
    for (qid, kk), ts in zip(zip(queries_pdf["query_id"], queries_pdf["k"]), qtoks):
        th = np.unique(terms_for_tokens(ts, cfg))
        terms = [
            (int(t), math.log(1.0 + (n_docs - df_map[int(t)] + 0.5) / (df_map[int(t)] + 0.5)))
            for t in th
            if int(t) in df_map
        ]
        if terms:
            queries.append((int(qid), int(kk), terms))

    shards_df = spark.createDataFrame(
        [(p,) for p in shard_paths], "path string"
    ).repartition(len(shard_paths))

    def per_shard(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for path in pdf["path"]:
                shard = _load_shard(path, avgdl, k1, b)
                out_q, out_d, out_s = [], [], []
                for qid, kk, terms in queries:
                    hits = []
                    for t, idf in terms:
                        e = shard.get(t)
                        if e is not None:
                            hits.append((e, idf))
                    if not hits:
                        continue
                    alld = np.concatenate([e[0] for e, _ in hits])
                    allc = np.concatenate([e[1] * idf for e, idf in hits])
                    docs, inv = np.unique(alld, return_inverse=True)
                    scores = np.zeros(len(docs), dtype=np.float64)
                    np.add.at(scores, inv, allc)
                    scores = np.round(scores, SCORE_DECIMALS)
                    top = np.lexsort((docs, -scores))[:kk]
                    out_q.extend([qid] * len(top))
                    out_d.extend(docs[top].tolist())
                    out_s.extend(scores[top].tolist())
                yield pd.DataFrame(
                    {"query_id": out_q, "doc_id": out_d, "bm25": out_s}
                )

    partial = shards_df.mapInPandas(
        per_shard, schema="query_id long, doc_id long, bm25 double"
    )
    kdf = F.broadcast(
        spark.createDataFrame(
            [(int(q), int(kk)) for q, kk, _ in queries], "query_id long, k int"
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        partial.join(kdf, "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "bm25")
    )


def topk_term_sharded(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list[str],
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """Term-sharded scatter/gather BM25 top-k — the third classical
    search partitioning (after document-sharded ``topk_maxscore_sharded``
    and the replica model ``topk_replica_resident``): each shard owns a
    TERM range (exactly the layout ``merge_segments`` writes), a query
    is routed ONLY to the shards owning its terms, each shard emits
    per-(query, doc) partial scores over its local postings, and a
    global sum + rank window produces the exact top-k.

    Routing uses the parquet footers' term min/max statistics per file
    (driver-side metadata reads, no data scan); a hot term split across
    adjacent range partitions by the composite (term, first_doc) key is
    routed to every file whose range covers it, and the global sum
    reassembles its contributions.

    Scale shape, honestly: term-sharding ships touched postings across
    the exchange (the partial-score rows), so for BM25 serving it is
    bandwidth-heavier than doc-sharding — included because it is the
    topology that wins for term-local workloads (df statistics, posting
    exports, hot-term isolation) and it exercises exact cross-shard
    score reassembly.  The shuffle carries partials only for terms the
    query batch actually touched.
    """
    import pyarrow.parquet as pq

    from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series

    k1, b = cfg.bm25_k1, cfg.bm25_b
    df_map = dict(zip(termdict_pdf["term"].astype(np.int64), termdict_pdf["df"].astype(np.int64)))

    qtoks = tokenize_series(queries_pdf["text"], cfg)
    queries = []
    for (qid, kk), ts in zip(zip(queries_pdf["query_id"], queries_pdf["k"]), qtoks):
        th = np.unique(terms_for_tokens(ts, cfg))
        terms = [
            (int(t), math.log(1.0 + (n_docs - df_map[int(t)] + 0.5) / (df_map[int(t)] + 0.5)))
            for t in th
            if int(t) in df_map
        ]
        if terms:
            queries.append((int(qid), int(kk), terms))

    # per-file term ranges from footer statistics (metadata only)
    los, his = [], []
    for p in shard_paths:
        md = pq.ParquetFile(p).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index("term")
        rmins, rmaxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            rmins.append(int(st.min))
            rmaxs.append(int(st.max))
        los.append(min(rmins) if rmins else 1)
        his.append(max(rmaxs) if rmaxs else 0)
    lo_a, hi_a = np.asarray(los, dtype=np.int64), np.asarray(his, dtype=np.int64)

    per_file: dict[int, list] = {}
    for qid, kk, terms in queries:
        for t, idf in terms:
            for i in np.flatnonzero((lo_a <= t) & (t <= hi_a)):
                per_file.setdefault(int(i), []).append((qid, t, idf))
    rows = [
        (shard_paths[i], json.dumps(work)) for i, work in sorted(per_file.items())
    ]
    if not rows:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, bm25 double"
        )
    rdf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, len(rows)), "path string, work string"
    )

    def per_shard(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for path, work in zip(pdf["path"], pdf["work"]):
                view = _load_shard(path, avgdl, k1, b)
                byq: dict[int, list] = {}
                for qid, t, idf in json.loads(work):
                    byq.setdefault(int(qid), []).append((int(t), float(idf)))
                out_q, out_d, out_s = [], [], []
                for qid, tl in byq.items():
                    hits = []
                    for t, idf in tl:
                        e = view.get(t)
                        if e is not None:
                            hits.append((e, idf))
                    if not hits:
                        continue
                    alld = np.concatenate([e[0] for e, _ in hits])
                    allc = np.concatenate([e[1] * idf for e, idf in hits])
                    docs, inv = np.unique(alld, return_inverse=True)
                    part = np.zeros(len(docs), dtype=np.float64)
                    np.add.at(part, inv, allc)
                    out_q.extend([qid] * len(docs))
                    out_d.extend(docs.tolist())
                    out_s.extend(part.tolist())
                yield pd.DataFrame(
                    {"query_id": out_q, "doc_id": out_d, "partial": out_s}
                )

    partial = rdf.mapInPandas(
        per_shard, schema="query_id long, doc_id long, partial double"
    )
    # ONE exchange: partials hash to their query, and the per-query
    # gather does sum + round (AFTER the global sum, BEFORE the rank —
    # rank-identity pin) + top-k in a single Arrow pass.  The earlier
    # groupBy(qid, doc) + rank-window shape paid a second exchange to
    # re-partition from (qid, doc) to qid.
    kmap = {int(q): int(kk) for q, kk, _ in queries}

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        docs, inv = np.unique(pdf["doc_id"].values, return_inverse=True)
        tot = np.zeros(len(docs), dtype=np.float64)
        np.add.at(tot, inv, pdf["partial"].values)
        tot = np.round(tot, SCORE_DECIMALS)
        top = np.lexsort((docs, -tot))[: kmap.get(qid, 0)]
        return pd.DataFrame(
            {
                "query_id": np.full(len(top), qid, dtype=np.int64),
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
                "doc_id": docs[top],
                "bm25": tot[top],
            }
        )

    return partial.groupBy("query_id").applyInPandas(
        gather, schema="query_id long, rank int, doc_id long, bm25 double"
    )


# replica cache: one merged decoded index VIEW per worker.  Keyed by
# the sorted path tuple + scoring constants.
_REPLICA_CACHE: dict = {}


class _ReplicaView:
    """Read-only merged-index view: sorted term array + offsets into
    concatenated (docs, tfn) arrays.  Arrays are usually ``np.memmap``
    views of node-shared files — decode happens once per NODE and every
    Python worker maps the same files, so the OS page cache backs all
    workers with ONE physical copy.  Term lookup is a ``searchsorted``
    (O(log vocab)); there is no per-worker dict build, so a fresh
    worker's replica "load" is four ``mmap`` calls (~ms), not a full
    decode.  This is what makes worker-pool churn (and per-node worker
    counts in the hundreds at 100 TB) free on the serving path."""

    __slots__ = ("terms", "offs", "docs", "tfn", "_max_doc")

    def __init__(self, terms, offs, docs, tfn):
        self.terms, self.offs, self.docs, self.tfn = terms, offs, docs, tfn
        self._max_doc = None

    @property
    def max_doc(self) -> int:
        """Largest doc id in the replica (-1 if empty).  Doc ids are
        NOT dense in n_docs when min-size predicates filtered docs out
        of the index (ids keep their pre-filter values), so dense
        score arrays must size to max_doc + 1, not n_docs.  Computed
        on first use (one sequential scan of the mmap) and cached."""
        if self._max_doc is None:
            self._max_doc = int(self.docs.max()) if len(self.docs) else -1
        return self._max_doc

    def get(self, t: int):
        i = int(np.searchsorted(self.terms, t))
        if i < len(self.terms) and self.terms[i] == t:
            s, e = self.offs[i], self.offs[i + 1]
            return self.docs[s:e], self.tfn[s:e]
        return None

    def __contains__(self, t: int) -> bool:
        return self.get(t) is not None

    def __getitem__(self, t: int):
        e = self.get(t)
        if e is None:
            raise KeyError(t)
        return e


def _merge_flat_shards(flats: list) -> tuple:
    """Vectorized k-way merge of per-shard flat posting arrays
    [(uterms, offs, docs, tfn), ...] into the global 4-array replica
    layout (terms sorted ascending; per-term postings concatenated in
    shard order).  No per-term Python loop and no global postings sort:
    per-(term, shard) destination offsets come from searchsorted +
    cumsum, and each shard scatters its postings with one fancy-index
    write — O(total postings) copies, O(vocab·shards) index math."""
    flats = [f for f in flats if len(f[0])]
    if not flats:
        return (
            np.empty(0, np.int64), np.zeros(1, np.int64),
            np.empty(0, np.int64), np.empty(0, np.float64),
        )
    uterms_list = [np.asarray(f[0], np.int64) for f in flats]
    counts_list = [np.diff(np.asarray(f[1], np.int64)) for f in flats]
    gterms = np.unique(np.concatenate(uterms_list))
    totals = np.zeros(len(gterms), np.int64)
    idxs = []
    for ut, cn in zip(uterms_list, counts_list):
        ix = np.searchsorted(gterms, ut)
        idxs.append(ix)
        np.add.at(totals, ix, cn)
    goffs = np.zeros(len(gterms) + 1, np.int64)
    np.cumsum(totals, out=goffs[1:])
    total = int(goffs[-1])
    docs = np.empty(total, np.int64)
    tfn = np.empty(total, np.float64)
    cursor = goffs[:-1].copy()  # per-term write position
    for (ut, offs, sdocs, stfn), ix, cn in zip(flats, idxs, counts_list):
        offs = np.asarray(offs, np.int64)
        # dest index of source posting t in term-block j:
        #   cursor[ix[j]] + (t - offs[j])
        pos = np.repeat(cursor[ix] - offs[:-1], cn) + np.arange(
            len(sdocs), dtype=np.int64
        )
        docs[pos] = sdocs
        tfn[pos] = stfn
        cursor[ix] += cn
    # canonical layout: per-term postings sorted by doc id.  The dense
    # resident path is order-insensitive, but the WAND/searchsorted
    # paths (operators/wand.py) seek within a term's doc list — shard
    # order only coincides with doc order when shard doc-ranges are
    # disjoint and filename-ordered (the fused-build layout).  After an
    # upstream repartition the ranges interleave, so detect and fix
    # with one stable lexsort (publish-once cost).
    tob = np.repeat(np.arange(len(gterms), dtype=np.int64), totals)
    step_down = (np.diff(docs) < 0) & (np.diff(tob) == 0)
    if step_down.any():
        order = np.lexsort((docs, tob))
        docs, tfn = docs[order], tfn[order]
    return gterms, goffs, docs, tfn


def _build_replica_arrays(paths: tuple, avgdl: float, k1: float, b: float):
    """Decode + merge every shard into the flat 4-array replica layout
    (terms sorted ascending; per-term postings concatenated in shard
    order).  Decode is vectorized per shard (_decode_shard_arrays) and
    the merge is the vectorized k-way scatter (_merge_flat_shards)."""
    return _merge_flat_shards(
        [_decode_shard_arrays(p, avgdl, k1, b) for p in paths]
    )


def _build_lmd_replica_arrays(paths: tuple, mu: float, total_tokens: float):
    """Decode + merge every shard into the flat 4-array replica layout
    with the PRECOMPUTED LM Dirichlet per-posting component in the
    value slot (where the BM25 store keeps tfn):

        comp = ln(1 + tf / (mu * cf_t / T)) + ln(mu / (dl + mu))

    cf_t (collection frequency) is GLOBAL per term, so it can only be
    finalized after the merge — shards are decoded raw (tf, dl), merged
    with the same deterministic k-way scatter as the BM25 store (two
    passes over the already-decoded arrays share one permutation), then
    cf = per-term segment sums and the component is one vectorized
    expression.  Serving reuses the identical dense-accumulate kernel
    with per-term weight 1.0 (the normalizer is inside the component,
    applied once per MATCHED term — Lucene LMDirichletSimilarity)."""
    dec = [_decode_shard_arrays_lmd(p) for p in paths]
    terms, offs, docs, tf = _merge_flat_shards(
        [(u, o, d, t) for u, o, d, t, _ in dec]
    )
    # deterministic: same (terms, docs) inputs -> same permutation, so
    # the dl merge aligns posting-for-posting with the tf merge
    dl = _merge_flat_shards([(u, o, d, l) for u, o, d, _, l in dec])[3]
    if len(terms) == 0:
        return terms, offs, docs, tf
    counts = np.diff(offs)
    cf = np.add.reduceat(tf, offs[:-1])
    p_rep = mu * np.repeat(cf, counts) / float(total_tokens)
    comp = np.log1p(tf / p_rep) + np.log(mu / (dl + mu))
    return terms, offs, docs, comp


def _load_lmd_replica(paths: tuple, mu: float, total_tokens: float) -> _ReplicaView:
    """Node-shared LM Dirichlet replica load — same publish-or-attach
    mmap store as the BM25 replica, keyed by the similarity module and
    its parameters so the two flavors never collide."""
    key = (paths, "lmd", float(mu), int(total_tokens))
    ent = _REPLICA_CACHE.get(key)
    if ent is not None:
        return ent
    view = _ReplicaView(
        *_published_arrays(
            key, paths, lambda: _build_lmd_replica_arrays(paths, mu, total_tokens)
        )
    )
    _REPLICA_CACHE.clear()  # one live replica per worker
    _REPLICA_CACHE[key] = view
    return view


_REPLICA_ARRAY_NAMES = ("terms", "offs", "docs", "tfn")


def _replica_store_dir(key: tuple, paths: tuple) -> str:
    import hashlib
    import tempfile

    # content guard: shard file sizes join the fingerprint so an index
    # rebuilt in-place under the same paths gets a fresh store
    try:
        sizes = tuple(os.path.getsize(p) for p in paths)
    except OSError:
        sizes = ()
    fp = hashlib.md5(repr((key, sizes)).encode()).hexdigest()[:16]
    base = os.environ.get("NIL_REPLICA_DIR") or tempfile.gettempdir()
    return os.path.join(base, f"nil_replica_{fp}")


def _published_arrays(
    key: tuple, paths: tuple, build_fn, names: tuple = _REPLICA_ARRAY_NAMES
):
    """Publish-or-attach for the node-shared array store.  First caller
    on the node runs ``build_fn`` and publishes the flat arrays (one
    per entry in ``names``) as ``.npy`` files (atomic rename + DONE
    marker, mkdir lock); every other worker — and every later worker
    cohort — just mmaps the published files.  Falls back to a private
    in-process build if the publisher appears dead (lock held past the
    deadline)."""
    import contextlib
    import uuid

    d = _replica_store_dir(key, paths)
    done = os.path.join(d, "DONE")
    timeout = float(os.environ.get("NIL_REPLICA_PUBLISH_TIMEOUT", "600"))
    if not os.path.exists(done):
        lock = d + ".lock"
        owner_file = d + ".lock.owner"
        token = f"{os.getpid()}-{uuid.uuid4().hex}"

        def _try_lock() -> bool:
            try:
                os.mkdir(lock)
            except FileExistsError:
                # heal a stale lock (publisher killed hard): a lock dir
                # older than the publish deadline cannot belong to a
                # live publisher — remove it and retake.  rmdir+mkdir
                # race between healers is safe: exactly one mkdir wins.
                try:
                    if time.time() - os.stat(lock).st_mtime > timeout:
                        os.rmdir(lock)
                        os.mkdir(lock)
                    else:
                        return False
                except OSError:
                    return False
            # ownership token: a publisher that ran past the deadline
            # (its lock was stolen by a healer) must NOT remove the
            # healer's lock in its finally — only the token owner
            # releases (the unguarded rmdir used to fail the healer's
            # task with FileNotFoundError after a successful publish)
            try:
                with open(owner_file, "w") as f:
                    f.write(token)
            except OSError:
                pass
            return True

        def _release() -> None:
            with contextlib.suppress(OSError):
                with open(owner_file) as f:
                    if f.read() != token:
                        return  # lock was stolen; it is not ours to remove
                os.remove(owner_file)
            with contextlib.suppress(OSError):
                os.rmdir(lock)

        acquired = _try_lock()
        if acquired:
            try:
                arrays = build_fn()
                os.makedirs(d, exist_ok=True)
                for n, a in zip(names, arrays):
                    tmp = os.path.join(d, f".{n}.{os.getpid()}.tmp.npy")
                    np.save(tmp, a)
                    os.replace(tmp, os.path.join(d, n + ".npy"))
                with open(done, "w") as f:
                    f.write("ok")
            finally:
                _release()
            del arrays  # drop the private copy; mmap the shared one below
        else:
            deadline = time.monotonic() + timeout
            while not os.path.exists(done) and time.monotonic() < deadline:
                time.sleep(0.05)
            if not os.path.exists(done):
                # publisher died: build privately, don't wait again
                return build_fn()
    return tuple(
        np.load(os.path.join(d, n + ".npy"), mmap_mode="r") for n in names
    )


def _load_replica(paths: tuple, avgdl: float, k1: float, b: float) -> _ReplicaView:
    """Node-shared replica load: decode once per node, mmap per worker
    (see ``_published_arrays``)."""
    key = (paths, round(avgdl, 9), k1, b)
    ent = _REPLICA_CACHE.get(key)
    if ent is not None:
        return ent
    view = _ReplicaView(
        *_published_arrays(
            key, paths, lambda: _build_replica_arrays(paths, avgdl, k1, b)
        )
    )
    _REPLICA_CACHE.clear()  # one live replica per worker
    _REPLICA_CACHE[key] = view
    return view


def publish_replica(
    shard_paths: list[str],
    avgdl: float,
    cfg: EngineConfig,
    spark: SparkSession | None = None,
) -> str:
    """Publish-at-build: materialize the node-shared mmap replica store
    for ``shard_paths`` NOW, so the first serving batch attaches in
    milliseconds instead of paying the full index decode (the cold-path
    cost that otherwise lands on the first query after every build).

    With a ``spark`` session the per-shard decode runs as a parallel
    Spark stage — each task decodes one shard into flat ``.npy`` dumps
    inside the store dir (atomic replace, idempotent on retry) — and
    only the final vectorized k-way merge (one O(postings) scatter
    pass, no parquet decode) is single-process.  Without a session the
    whole build runs in-process.

    Cluster note: the store lives under ``NIL_REPLICA_DIR`` (default
    tmp), i.e. node-local disk.  In local mode — and on any cluster
    whose serving executors share the build node — publish-at-build
    removes the serving decode entirely.  On a multi-node cluster the
    same function runs per node (serving nodes attach lazily and the
    FIRST worker on a node that finds flat dumps on shared storage, or
    no store at all, rebuilds/merges locally via ``_load_replica`` —
    the publish lock keeps that to once per node).  The key is
    identical to ``_load_replica``'s, so serving finds this store with
    no coordination.
    """
    paths = tuple(sorted(shard_paths))
    k1, b = cfg.bm25_k1, cfg.bm25_b
    key = (paths, round(avgdl, 9), k1, b)
    d = _replica_store_dir(key, paths)
    done = os.path.join(d, "DONE")
    if os.path.exists(done):
        return d
    n_flats = len(paths)
    if spark is not None and n_flats > 1:
        os.makedirs(d, exist_ok=True)

        def _dump(item) -> int:
            i, p = item
            import numpy as _np
            import os as _os

            names = [f"flat{i:05d}.{n}.npy" for n in _REPLICA_ARRAY_NAMES]
            if all(_os.path.exists(_os.path.join(d, n)) for n in names):
                return 0
            arrays = _decode_shard_arrays(p, avgdl, k1, b)
            for name, a in zip(names, arrays):
                # tmp must end in .npy or np.save appends the suffix
                tmp = _os.path.join(d, f".{name}.{_os.getpid()}.tmp.npy")
                _np.save(tmp, a)
                _os.replace(tmp, _os.path.join(d, name))
            return 1

        spark.sparkContext.parallelize(
            list(enumerate(paths)), n_flats
        ).map(_dump).count()

        def _merge_from_dumps():
            flats = [
                tuple(
                    np.load(os.path.join(d, f"flat{i:05d}.{n}.npy"), mmap_mode="r")
                    for n in _REPLICA_ARRAY_NAMES
                )
                for i in range(n_flats)
            ]
            return _merge_flat_shards(flats)

        build_fn = _merge_from_dumps
    else:
        build_fn = lambda: _build_replica_arrays(paths, avgdl, k1, b)  # noqa: E731
    _published_arrays(key, paths, build_fn)
    # flat dumps served their purpose; keep the store lean
    import contextlib
    import glob as _glob

    for f in _glob.glob(os.path.join(d, "flat*.npy")):
        with contextlib.suppress(OSError):
            os.remove(f)
    return d


# ------------------------- driver-resident term-dictionary bound


# Every non-join serving topology (replica / doc-sharded / term-sharded
# / WAND / federated-replica) materializes the FULL term dictionary
# driver-side to build the broadcast term→df map.  Bounded for a
# unigram word vocabulary (~10^7 terms at web scale ≈ low GBs — fine),
# but shingle serving (gram_size>1) can push |vocab| toward the posting
# count itself, where the collect OOMs the driver.  The join topology
# (topk_maxscore) has no such bound: it looks terms up BY JOIN and
# streams the dictionary like any other relation — that is the
# documented fallback past this limit.
TERMDICT_DRIVER_MAX = 20_000_000


class TermdictTooLargeError(ValueError):
    """Structured refusal: the term dictionary exceeds the
    driver-resident bound of the requested serving topology."""


def check_termdict_size(termdict: DataFrame, max_terms: int | None = None) -> int:
    """Count the dictionary and raise :class:`TermdictTooLargeError`
    when it exceeds the driver-resident bound (default
    ``TERMDICT_DRIVER_MAX``, env override ``NIL_TERMDICT_DRIVER_MAX``).
    Returns the count.  One vocabulary-sized aggregate — cheap next to
    the collect it guards."""
    limit = (
        max_terms
        if max_terms is not None
        else int(os.environ.get("NIL_TERMDICT_DRIVER_MAX",
                                TERMDICT_DRIVER_MAX))
    )
    n = termdict.count()
    if n > limit:
        raise TermdictTooLargeError(
            f"term dictionary has {n} entries, over the driver-resident "
            f"bound of {limit} for this serving topology — serve via the "
            f"join topology (topk_maxscore), which streams the dictionary "
            f"through a join instead of collecting it, or raise "
            f"NIL_TERMDICT_DRIVER_MAX if the driver has the memory"
        )
    return n


def collect_termdict(
    termdict: DataFrame, max_terms: int | None = None
) -> pd.DataFrame:
    """``termdict.toPandas()`` behind :func:`check_termdict_size` — the
    guarded collect every driver-resident topology should use."""
    check_termdict_size(termdict, max_terms)
    return termdict.toPandas()


def topk_replica_resident(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list[str],
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    n_splits: int | None = None,
    tokenize_on: str = "driver",
    df_map: dict | None = None,
    df_bc=None,
    similarity: str = "bm25",
    decay: dict | None = None,
    sort_by: dict | None = None,
) -> DataFrame:
    """Replica-resident BM25 top-k: the decoded index lives in every
    Python worker (loaded once, reused across jobs); the QUERY batch is
    what Spark partitions.  Scoring is a dense ``np.bincount`` over doc
    ids per query — O(touched postings), no sort — with top-k via
    ``argpartition``.

    A long-lived caller (the streaming query server) serves MANY
    batches against one fixed index: pass ``df_map`` (term→df dict
    derived from ``termdict_pdf``) and, for ``tokenize_on="worker"``,
    ``df_bc`` (a SparkContext broadcast of that dict) to avoid
    rebuilding the O(|vocab|) dict and re-broadcasting it per batch —
    both are caller-owned (this function never destroys ``df_bc``).

    ``tokenize_on="driver"`` (default) tokenizes the batch up front and
    ships (term, idf) lists — fine for thousands of queries.
    ``tokenize_on="worker"`` ships raw text and tokenizes inside each
    split with the term→df map distributed as a Spark broadcast
    variable — the shape for millions of queries, where driver-side
    tokenization would serialize the whole batch through one core.

    Cursor pagination (search_after): optional ``after_score`` /
    ``after_doc`` columns on ``queries_pdf`` restrict each query's
    result to docs STRICTLY AFTER the cursor in (bm25 DESC, doc_id ASC)
    order — page N's cursor is page N-1's last (bm25, doc_id) row, and
    every page costs one k-sized top-k (no offset re-rank of the
    skipped prefix).  ``after_doc`` < 0 (or missing columns) means no
    cursor.  Admission is exact: occurrences are compared on the
    ROUNDED score (the kernel's output space), so a page-2 run returns
    exactly ranks k+1..2k of a double-k run.

    Serving-topology note (100 TB): this is the replica model — right
    when the index fits node memory (as here).  When it doesn't, use
    :func:`topk_maxscore_sharded` (document-sharded scatter/gather) or
    partition the term space; the query-side code is identical either
    way because shard files are self-contained.
    """
    from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series

    k1, b = cfg.bm25_k1, cfg.bm25_b
    # pluggable similarity (Lucene setSimilarity analog): "bm25" scores
    # idf * tfn from the BM25 replica store; "lmd" (LM Dirichlet) scores
    # the precomputed per-posting component from the LMD store at
    # per-term weight 1.0.  Same kernel, same top-k math — only the
    # store flavor and the query-term weight differ.
    lmd_mu = float(getattr(cfg, "lmd_mu", 2000.0))
    # exact total-token recovery: dl are integers, so rounding the
    # float product avgdl*n_docs reconstructs sum(dl) exactly
    total_tokens = int(round(avgdl * n_docs))
    # doc-values consumers (operators/docvalues.py), both in-kernel:
    #  * decay = {"dv_dir", "origin", "sigma"} — gaussian function_score
    #    rescoring: every occurrence/candidate score is multiplied by
    #    the doc's decay factor BEFORE thresholding, ranking, and
    #    search_after admission, so the combined score is the single
    #    score space end to end;
    #  * sort_by = {"dv_dir", "ascending"} — rank matching docs by the
    #    field value (scoring skipped entirely); the value is emitted in
    #    the score slot.
    if decay is not None and sort_by is not None:
        raise ValueError("decay and sort_by are mutually exclusive")
    if df_map is None:
        df_map = dict(
            zip(termdict_pdf["term"].astype(np.int64), termdict_pdf["df"].astype(np.int64))
        )

    def _qterms(ts: list, dfm: dict) -> list:
        th = np.unique(terms_for_tokens(ts, cfg))
        if similarity == "lmd":
            return [(int(t), 1.0) for t in th if int(t) in dfm]
        return [
            (int(t), math.log(1.0 + (n_docs - dfm[int(t)] + 0.5) / (dfm[int(t)] + 0.5)))
            for t in th
            if int(t) in dfm
        ]

    paths = tuple(sorted(shard_paths))
    n_splits = n_splits or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    # The query batch is sliced into exactly n_splits partitions via
    # parallelize — EXACT count balance and zero shuffle.  (The earlier
    # repartition(n_splits, "split") hash-partitioned n_splits distinct
    # keys into n_splits partitions: ~1/e of the partitions land empty
    # and others get 2-3 splits, a straggler tax on every batch.)
    # search_after cursors: sentinel after_doc=-1 means "no cursor"
    if "after_doc" in queries_pdf.columns:
        _ad = [
            -1 if pd.isna(d) else int(d) for d in queries_pdf["after_doc"]
        ]
        # NaN after_score is PRESERVED: under a field sort it is a real
        # cursor position (the page ended inside the missing-values
        # block, which sorts last — the kernel maps it to the same ±inf
        # sentinel sort_key uses).  On the BM25 path a NaN cursor can't
        # come from a real page (scores are never NaN); there the
        # all-False keep mask returns the empty page, i.e. "past the
        # end", which is the honest answer for a forged cursor.
        _as = [
            float("nan") if pd.isna(s) else float(s)
            for s in queries_pdf.get("after_score", [float("nan")] * len(_ad))
        ]
    else:
        _ad = [-1] * len(queries_pdf)
        _as = [0.0] * len(queries_pdf)
    if tokenize_on == "worker":
        if df_bc is None:
            df_bc = spark.sparkContext.broadcast(df_map)
        rows = [
            (int(q), int(kk), t, s, d)
            for q, kk, t, s, d in zip(
                queries_pdf["query_id"], queries_pdf["k"], queries_pdf["text"],
                _as, _ad,
            )
        ]
        qdf = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, n_splits),
            "query_id long, k int, text string, after_score double, after_doc long",
        )
    else:
        df_bc = None
        qtoks = tokenize_series(queries_pdf["text"], cfg)
        queries = []
        for (qid, kk, a_s, a_d), ts in zip(
            zip(queries_pdf["query_id"], queries_pdf["k"], _as, _ad), qtoks
        ):
            terms = _qterms(ts, df_map)
            if terms:
                queries.append((int(qid), int(kk), json.dumps(terms), a_s, a_d))
        qdf = spark.createDataFrame(
            spark.sparkContext.parallelize(queries, n_splits),
            "query_id long, k int, terms_json string, after_score double, after_doc long",
        )

    def per_split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        replica = None
        scores = None
        dvals = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if replica is None:
                replica = (
                    _load_lmd_replica(paths, lmd_mu, total_tokens)
                    if similarity == "lmd"
                    else _load_replica(paths, avgdl, k1, b)
                )
                # size to max doc id, not n_docs: ids are sparse when
                # min-size predicates filtered docs out of the index
                scores = np.zeros(
                    max(n_docs, replica.max_doc + 1), dtype=np.float64
                )
                if decay is not None or sort_by is not None:
                    spec = decay or sort_by
                    if spec.get("kind") == "keyword":
                        # Lucene sorts keyword fields by SortedDocValues
                        # ORDINAL — the dictionary is sorted, so ordinal
                        # order IS term order; missing (-1) becomes NaN
                        # and rides the numeric NaN-last sort path
                        from nil_spark.operators.docvalues import (
                            load_keyword_docvalues,
                        )

                        _ords, _ = load_keyword_docvalues(spec["dv_dir"])
                        dvals = np.where(
                            _ords < 0, np.nan, _ords.astype(np.float64)
                        )
                    else:
                        from nil_spark.operators.docvalues import (
                            load_docvalues,
                        )

                        dvals = load_docvalues(spec["dv_dir"])
            out_q, out_r, out_d, out_s = [], [], [], []
            if df_bc is not None:  # worker-side tokenize
                toks = tokenize_series(pdf["text"], cfg)
                tlists = [_qterms(ts, df_bc.value) for ts in toks]
            else:
                tlists = [json.loads(tj) for tj in pdf["terms_json"]]
            for qid, kk, tl, a_s, a_d in zip(
                pdf["query_id"], pdf["k"], tlists,
                pdf["after_score"], pdf["after_doc"],
            ):
                hits = []
                for t, idf in tl:
                    e = replica.get(t)
                    if e is not None:
                        hits.append((e, idf))
                if not hits:
                    continue
                if sort_by is not None:
                    # sort-by-field: matching docs ranked by doc value,
                    # no scoring pass at all (Lucene sort / ES sort
                    # clause); value emitted in the score slot, NaN last
                    from nil_spark.operators.docvalues import sort_key

                    cu = np.unique(
                        np.concatenate([e[0] for e, _ in hits])
                        if len(hits) > 1
                        else hits[0][0][0]
                    )
                    kk = int(kk)
                    asc = sort_by["ascending"]
                    keyv = sort_key(dvals, cu, asc)
                    if a_d >= 0:
                        # search_after in the field-sort space: the
                        # cursor is (page N-1's last sort_value,
                        # doc_id).  Compared on the ROUNDED key — the
                        # space the cursor came from — exact across
                        # equal-value ties; a NaN cursor (the page
                        # ended inside the missing-values block, which
                        # sorts last) maps to the same ±inf sentinel
                        # sort_key uses, so paging continues by doc_id
                        # within that block.
                        rk = np.round(keyv, SCORE_DECIMALS)
                        a_v = (
                            (np.inf if asc else -np.inf)
                            if np.isnan(a_s)
                            else a_s
                        )
                        keep = (
                            ((rk > a_v) if asc else (rk < a_v))
                            | ((rk == a_v) & (cu > a_d))
                        )
                        cu, keyv = cu[keep], keyv[keep]
                        if not len(cu):
                            continue
                    order = np.lexsort(
                        (cu, keyv if asc else -keyv)
                    )[: min(kk, len(cu))]
                    vals = np.where(
                        cu[order] < len(dvals),
                        dvals[np.minimum(cu[order], len(dvals) - 1)],
                        np.nan,
                    )
                    out_q.extend([int(qid)] * len(order))
                    out_r.extend(range(1, len(order) + 1))
                    out_d.extend(cu[order].tolist())
                    out_s.extend(np.round(vals, SCORE_DECIMALS).tolist())
                    continue
                # dense accumulate: doc lists within a term are unique,
                # so fancy-index += is safe per term
                for e, idf in hits:
                    scores[e[0]] += idf * e[1]
                # Threshold from the DUPLICATED occurrence view — no
                # touched-doc mask, no corpus-length scan: gather the
                # final score at every posting occurrence; a doc occurs
                # at most len(hits) times, so the top k·len(hits) dup
                # entries are guaranteed to cover >= k unique docs, and
                # their min is a valid lower bound on the true kth
                # score.  Rounding (SCORE_DECIMALS, monotone) can move
                # a score at most 0.5e-8, so a v-1e-8 guard keeps the
                # candidate set a superset of the exact rounded top-k;
                # only THAT small set is deduped, rounded, and ranked
                # (round BEFORE rank, ties by doc_id — rank-identity
                # pin, same as the oracle).
                docs_cat = (
                    np.concatenate([e[0] for e, _ in hits])
                    if len(hits) > 1
                    else hits[0][0][0]
                )
                sc_dup = scores[docs_cat]
                if decay is not None:
                    # function_score gaussian decay: fold the per-doc
                    # factor in BEFORE thresholding / admission so the
                    # combined score is the kernel's only score space
                    from nil_spark.operators.docvalues import gauss_factor

                    sc_dup = sc_dup * gauss_factor(
                        dvals, docs_cat, decay["origin"], decay["sigma"]
                    )
                kk = int(kk)
                if a_d >= 0:
                    # search_after admission, applied in the duplicated
                    # occurrence view BEFORE the coverage threshold so
                    # the top-m argument holds within the post-cursor
                    # set.  Compared on the ROUNDED score — the space
                    # the cursor came from — so page boundaries are
                    # exact even across equal-score ties.
                    r_dup = np.round(sc_dup, SCORE_DECIMALS)
                    keep = (r_dup < a_s) | ((r_dup == a_s) & (docs_cat > a_d))
                    page_docs = docs_cat[keep]
                    page_sc = sc_dup[keep]
                else:
                    page_docs, page_sc = docs_cat, sc_dup
                m = kk * len(hits)
                if m < len(page_sc):
                    v = -np.partition(-page_sc, m - 1)[m - 1]
                    cd = page_docs[page_sc >= v - 1e-8]
                else:
                    cd = page_docs
                cu = np.unique(cd)
                fsc = scores[cu]
                if decay is not None:
                    from nil_spark.operators.docvalues import gauss_factor

                    fsc = fsc * gauss_factor(
                        dvals, cu, decay["origin"], decay["sigma"]
                    )
                csc = np.round(fsc, SCORE_DECIMALS)
                top = np.lexsort((cu, -csc))[: min(kk, len(cu))]
                out_q.extend([int(qid)] * len(top))
                out_r.extend(range(1, len(top) + 1))
                out_d.extend(cu[top].tolist())
                out_s.extend(csc[top].tolist())
                scores[docs_cat] = 0.0  # reset only touched slots
            yield pd.DataFrame(
                {"query_id": out_q, "rank": out_r, "doc_id": out_d, "bm25": out_s}
            )

    # Each query lives in exactly ONE split (parallelize slices the
    # batch), so the kernel's rounded, doc_id-tie-broken top-k IS the
    # final answer — rank is emitted in-kernel and the job is a single
    # ZERO-shuffle stage.  (A global rank window here would shuffle
    # n_queries·k rows to re-sort lists that are already each sorted;
    # the sharded topology — topk_maxscore_sharded — is the one that
    # genuinely needs a cross-shard merge.)
    return qdf.mapInPandas(
        per_split, schema="query_id long, rank int, doc_id long, bm25 double"
    )


def explain_topk_replica(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list[str],
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    n_splits: int | None = None,
    excluded: np.ndarray | None = None,
) -> DataFrame:
    """Lucene-style ``Explanation`` at the engine level: for each
    query's top-k docs, one row per contributing term with the term's
    idf and its exact score contribution, read from the SAME replica
    arrays the serving kernel scores with (``tfn`` is the stored
    tf-saturation, so contrib = idf·tfn with zero recomputation).
    The per-doc total is pinned to the serving kernel's rounded bm25 —
    an explain row set always sums to what ``topk_replica_resident``
    returned for that doc.

    ``excluded`` (optional int64 doc-id array — live-docs tombstones)
    is applied in-kernel at admission, same as the WAND path, so
    explaining a post-delete index explains exactly the surviving
    ranking.

    Explain batches are interactive-sized (a page of hits, not a query
    stream), so this ships driver-tokenized (term, idf) lists; the
    breakdown job is the same zero-shuffle query-split topology as
    serving."""
    from nil_spark.functions.tokenize import tokenize_series, terms_for_tokens

    k1, b = cfg.bm25_k1, cfg.bm25_b
    df_map = dict(
        zip(termdict_pdf["term"].astype(np.int64), termdict_pdf["df"].astype(np.int64))
    )
    paths = tuple(sorted(shard_paths))
    n_splits = n_splits or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    qtoks = tokenize_series(queries_pdf["text"], cfg)
    queries = []
    for (qid, kk), ts in zip(
        zip(queries_pdf["query_id"], queries_pdf["k"]), qtoks
    ):
        th = np.unique(terms_for_tokens(ts, cfg))
        terms = [
            (int(t), math.log(1.0 + (n_docs - df_map[int(t)] + 0.5) / (df_map[int(t)] + 0.5)))
            for t in th
            if int(t) in df_map
        ]
        if terms:
            queries.append((int(qid), int(kk), json.dumps(terms)))
    qdf = spark.createDataFrame(
        spark.sparkContext.parallelize(queries, n_splits),
        "query_id long, k int, terms_json string",
    )
    excl = (
        np.asarray(excluded, dtype=np.int64)
        if excluded is not None and len(excluded)
        else None
    )

    def per_split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        replica = None
        scores = None
        excl_mask = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if replica is None:
                replica = _load_replica(paths, avgdl, k1, b)
                size = max(n_docs, replica.max_doc + 1)
                scores = np.zeros(size, dtype=np.float64)
                if excl is not None:
                    excl_mask = np.zeros(size, dtype=bool)
                    excl_mask[excl[excl < size]] = True
            out = {c: [] for c in
                   ("query_id", "rank", "doc_id", "term", "idf", "contrib", "bm25")}
            for qid, kk, tj in zip(pdf["query_id"], pdf["k"], pdf["terms_json"]):
                tl = json.loads(tj)
                hits = []
                for t, idf in tl:
                    e = replica.get(t)
                    if e is not None:
                        hits.append((int(t), e, idf))
                if not hits:
                    continue
                for _t, e, idf in hits:
                    scores[e[0]] += idf * e[1]
                docs_cat = (
                    np.concatenate([e[0] for _t, e, _i in hits])
                    if len(hits) > 1
                    else hits[0][1][0]
                )
                if excl_mask is not None:
                    live_cat = docs_cat[~excl_mask[docs_cat]]
                else:
                    live_cat = docs_cat
                if len(live_cat):
                    sc_dup = scores[live_cat]
                    kk = int(kk)
                    m = kk * len(hits)
                    if m < len(sc_dup):
                        v = -np.partition(-sc_dup, m - 1)[m - 1]
                        cd = live_cat[sc_dup >= v - 1e-8]
                    else:
                        cd = live_cat
                    cu = np.unique(cd)
                    csc = np.round(scores[cu], SCORE_DECIMALS)
                    top = np.lexsort((cu, -csc))[: min(kk, len(cu))]
                    top_docs = cu[top]
                    top_sc = csc[top]
                    # per-term breakdown for the winners only: membership
                    # probe of each term's posting docs against the
                    # top-doc set (postings within a term are in shard
                    # order, not doc order, so isin not searchsorted)
                    rank_of = {int(d): (r + 1, float(s))
                               for r, (d, s) in enumerate(zip(top_docs, top_sc))}
                    for t, e, idf in hits:
                        sel = np.isin(e[0], top_docs)
                        if not sel.any():
                            continue
                        dsel = e[0][sel]
                        csel = idf * e[1][sel]
                        for d, c in zip(dsel.tolist(), csel.tolist()):
                            r, s = rank_of[int(d)]
                            out["query_id"].append(int(qid))
                            out["rank"].append(r)
                            out["doc_id"].append(int(d))
                            out["term"].append(int(t))
                            out["idf"].append(round(float(idf), SCORE_DECIMALS))
                            out["contrib"].append(round(float(c), SCORE_DECIMALS))
                            out["bm25"].append(s)
                scores[docs_cat] = 0.0  # reset only touched slots
            yield pd.DataFrame(out)

    return qdf.mapInPandas(
        per_split,
        schema="query_id long, rank int, doc_id long, term long, "
               "idf double, contrib double, bm25 double",
    )


SEGMENT_FORMAT_VERSION = 2  # v2: per-chunk last_doc skip-list bound


def _cfg_fingerprint(cfg: EngineConfig) -> str:
    import hashlib

    rel = (
        cfg.gram_size, cfg.min_tokens, cfg.min_chars, cfg.token_pattern,
        cfg.distinct_ngrams, cfg.bm25_k1, cfg.bm25_b, cfg.num_segments,
        cfg.block_size, cfg.df_stopword_cutoff, SEGMENT_FORMAT_VERSION,
    )
    # appended only when non-standard so every pre-analyzer index keeps
    # its recorded fingerprint (backwards compatible); a non-standard
    # analyzer MUST drift the fingerprint — querying a stemmed index
    # with unstemmed query tokens would silently miss terms
    if getattr(cfg, "analyzer", "standard") != "standard":
        rel = rel + (cfg.analyzer,)
    return hashlib.md5(repr(rel).encode()).hexdigest()[:16]


class CheckpointedIndexBuilder:
    """Stage-checkpointed index build with per-partition lineage.

    Each stage (docstats → postings → segments) writes parquet plus a
    manifest entry {stage, rows, per-partition counts, wall seconds,
    config fingerprint}.  A re-run skips any stage whose output +
    manifest already exist with a matching fingerprint — the Spark
    analog of the reference's results-dir provenance
    (NILMain.kt:43-47) and the north rule's checkpoint-resume clause.
    """

    def __init__(self, path: str, cfg: EngineConfig):
        self.path = path
        self.cfg = cfg
        self.manifest_path = os.path.join(path, "manifest.json")
        self.manifest = self._load()

    def _load(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"config_fingerprint": _cfg_fingerprint(self.cfg), "stages": {}}

    def _save(self):
        os.makedirs(self.path, exist_ok=True)
        with open(self.manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2, default=str)

    def _stage_done(self, name: str) -> bool:
        ent = self.manifest["stages"].get(name)
        return (
            ent is not None
            and ent.get("config_fingerprint") == _cfg_fingerprint(self.cfg)
            and os.path.exists(os.path.join(self.path, name, "_SUCCESS"))
        )

    def _run_stage(self, name: str, df_fn, spark: SparkSession) -> DataFrame:
        out_dir = os.path.join(self.path, name)
        if self._stage_done(name):
            return spark.read.parquet(out_dir)
        t0 = time.time()
        df = df_fn()
        df.write.mode("overwrite").parquet(out_dir)
        written = spark.read.parquet(out_dir)
        parts = (
            written.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .orderBy("pid")
            .collect()
        )
        self.manifest["stages"][name] = {
            "config_fingerprint": _cfg_fingerprint(self.cfg),
            "rows": int(sum(r["count"] for r in parts)),
            "partitions": [{"pid": int(r["pid"]), "rows": int(r["count"])} for r in parts],
            "wall_s": round(time.time() - t0, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._save()
        return written

    def build_fused(self, docs: DataFrame) -> dict:
        """Checkpointed FUSED build: partial segments (one Arrow stage)
        → termdict → external merge, each stage parquet-checkpointed
        with per-partition lineage; a re-run (resume after failure)
        skips completed stages via the manifest fingerprint exactly like
        the classic path."""
        spark = docs.sparkSession
        cfg = self.cfg

        partial = self._run_stage(
            "partial_segments", lambda: build_partial_segments(docs, cfg), spark
        )
        sent = partial.filter(F.col("term") == DOCSTAT_SENTINEL)
        segs = partial.filter(F.col("term") != DOCSTAT_SENTINEL)
        stats = sent.agg(
            F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
        ).collect()[0]
        n_docs = int(stats["n"])
        avgdl = float(stats["s"]) / max(n_docs, 1)
        self.manifest["corpus"] = {"n_docs": n_docs, "avgdl": avgdl}

        termdict = self._run_stage(
            "termdict",
            lambda: segs.groupBy("term").agg(
                F.sum("n_postings").cast("long").alias("df")
            ),
            spark,
        )
        cutoff = cfg.df_stopword_cutoff
        if cutoff is not None and cutoff < 1.0:
            stop = termdict.filter(F.col("df") > int(cutoff * n_docs)).select("term")
            segs = segs.join(F.broadcast(stop), "term", "left_anti")
        segments = self._run_stage(
            "segments", lambda: merge_segments(segs, cfg), spark
        )
        self._save()
        return {
            "segments": segments,
            "termdict": termdict,
            "docstats_blobs": sent,
            "n_docs": n_docs,
            "avgdl": avgdl,
        }

    def build(self, docs: DataFrame) -> dict:
        """docs must carry doc_id + text.  Returns index handle dict."""
        from nil_spark.functions.tokenize import with_term_counts

        spark = docs.sparkSession
        cfg = self.cfg

        dt = with_term_counts(docs, cfg).persist()
        docstats = self._run_stage(
            "docstats", lambda: index_ops.doc_stats(dt), spark
        )
        n_docs, avgdl = index_ops.corpus_stats(docstats)
        self.manifest["corpus"] = {"n_docs": n_docs, "avgdl": avgdl}

        postings = self._run_stage(
            "postings",
            lambda: index_ops.prune_stopwords(
                index_ops.exploded_postings(dt, cfg),
                index_ops.term_dictionary(index_ops.exploded_postings(dt, cfg)),
                n_docs,
                cfg,
            ),
            spark,
        )
        termdict = self._run_stage(
            "termdict", lambda: index_ops.term_dictionary(postings), spark
        )
        segments = self._run_stage(
            "segments", lambda: build_segments(postings, cfg), spark
        )
        self._save()
        dt.unpersist()
        return {
            "segments": segments,
            "termdict": termdict,
            "docstats": docstats,
            "postings": postings,
            "n_docs": n_docs,
            "avgdl": avgdl,
        }
