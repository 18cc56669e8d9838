"""Positional postings: a side-car position store and an index-native
phrase search that never re-reads document text.

The main segment format (operators/segments.py, SEGMENT_SCHEMA) stays
frequency-only — BM25/WAND never pay for positions — and this module
adds a SEPARATE term-sorted store of token positions, the classic
side-file layout (Lucene keeps positions in ``.pos`` next to ``.doc``
for the same reason).  Reference analog: NIL verifies candidate pairs
by re-tokenizing source text (OptimizedCloneDetection.kt:17-56);
at 100 TB the equivalent "re-read candidate text" join is the
dominant phrase-query cost, and position lists remove it entirely —
a phrase query touches only its own terms' postings.

Store schema (POS_SCHEMA), one row per (term, chunk):
  ``doc_blob``  varint doc-id gaps, absolute at chunk start
  ``cnt_blob``  varint occurrence count per doc (posting order)
  ``pos_blob``  varint token-position deltas, absolute at each
                posting's first occurrence
Positions are TOKEN-level (gram_size is irrelevant here: phrase
contiguity is defined over tokens, and the store must stay
full-vocabulary — no df stopword pruning — so that "term absent from
the store" soundly implies "no document matches").

Scale shape (100 TB): the build is the same fused single-Arrow-stage
sweep as the frequency index (three global varint encodes per
partition, byte-range slicing per chunk — no per-term Python); the
store is written term-range sorted so a phrase query's
``term IN (...)`` scan prunes to its own row groups via parquet
min/max stats.  Query execution is one broadcast join (query terms
are tiny) plus ONE shuffle keyed by query_id; per-query work is
``sum(df_term)`` postings decoded, independent of corpus size.  Hot
phrase terms bound the group like every other serving topology —
df-based admission belongs to the caller (a phrase of pure stopwords
is degenerate in any engine).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions import varint
from nil_spark.functions.tokenize import _hash_token, tokenize_series

POS_SCHEMA = (
    "term long, chunk_idx int, first_doc long, last_doc long, "
    "n_postings long, doc_blob binary, cnt_blob binary, pos_blob binary"
)

_POS_COLS = [
    "term", "chunk_idx", "first_doc", "last_doc", "n_postings",
    "doc_blob", "cnt_blob", "pos_blob",
]

# positions are packed as (doc_id << 32 | pos); BOTH halves must fit
# 32 bits — a document longer than 4.29e9 tokens OR a doc id beyond
# 4.29e9 is rejected at build time rather than silently aliased (a
# doc id overflowing the high half would merge its occurrences into
# another doc's position list).  A corpus beyond 2^32 docs shards the
# positional store by doc range: each shard packs its own ids, the
# per-doc kernels are embarrassingly parallel across shards, and the
# results union — nothing in the query plan crosses shard boundaries.
_MAX_POS = (1 << 32) - 1


def _encode_pos_table(
    terms: np.ndarray, docs: np.ndarray, poss: np.ndarray, max_chunk: int
) -> dict:
    """Vectorized (term, doc, pos) occurrence table → POS_SCHEMA rows.

    Input must be lexsorted by (term, doc, pos).  Three global varint
    encodes (doc gaps, per-posting counts, position deltas) + one
    cumsum-derived byte-range slice per chunk — no per-term Python,
    the same construction discipline as segments._encode_run_table.
    """
    n_occ = len(terms)
    # posting (= term,doc group) boundaries over occurrences
    newp = np.empty(n_occ, dtype=bool)
    newp[0] = True
    newp[1:] = (terms[1:] != terms[:-1]) | (docs[1:] != docs[:-1])
    p_start = np.flatnonzero(newp)                       # occ index
    p_cnt = np.diff(np.append(p_start, n_occ))
    g_term, g_doc = terms[p_start], docs[p_start]
    occ_off = np.append(p_start, n_occ)                  # len groups+1

    # chunking per term over POSTINGS (a doc's positions never split)
    cuts = np.flatnonzero(np.diff(g_term)) + 1
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts, [len(g_term)]))
    run_lens = ends - starts
    reps = (run_lens + max_chunk - 1) // max_chunk
    rep_off = np.concatenate(([0], np.cumsum(reps)[:-1]))
    chunk_run = np.repeat(np.arange(len(starts)), reps)
    pos_in_run = np.arange(len(chunk_run)) - rep_off[chunk_run]
    c_starts = starts[chunk_run] + pos_in_run * max_chunk    # group idx
    c_ends = np.minimum(c_starts + max_chunk, ends[chunk_run])

    # doc gaps, absolute at every chunk start
    gaps = np.empty(len(g_doc), dtype=np.uint64)
    gaps[1:] = (g_doc[1:] - g_doc[:-1]).astype(np.uint64)
    gaps[c_starts] = g_doc[c_starts].astype(np.uint64)

    # position deltas, absolute at every posting start
    pdelta = np.empty(n_occ, dtype=np.uint64)
    pdelta[1:] = (poss[1:] - poss[:-1]).astype(np.uint64)
    pdelta[p_start] = poss[p_start].astype(np.uint64)

    def bufs(vals: np.ndarray):
        off = np.zeros(len(vals) + 1, dtype=np.int64)
        off[1:] = np.cumsum(varint.byte_lengths(vals))
        return varint.encode(vals), off

    doc_buf, doc_off = bufs(gaps)
    cnt_buf, cnt_off = bufs(p_cnt.astype(np.uint64))
    pos_buf, pos_off = bufs(pdelta)

    return {
        "term": g_term[c_starts],
        "chunk_idx": pos_in_run.astype(np.int32),
        "first_doc": g_doc[c_starts],
        "last_doc": g_doc[c_ends - 1],
        "n_postings": c_ends - c_starts,
        "doc_blob": [
            doc_buf[doc_off[s]:doc_off[e]] for s, e in zip(c_starts, c_ends)
        ],
        "cnt_blob": [
            cnt_buf[cnt_off[s]:cnt_off[e]] for s, e in zip(c_starts, c_ends)
        ],
        "pos_blob": [
            pos_buf[pos_off[occ_off[s]]:pos_off[occ_off[e]]]
            for s, e in zip(c_starts, c_ends)
        ],
    }


def _pos_partition_frame(
    pdf: pd.DataFrame, cfg: EngineConfig, max_chunk: int
) -> pd.DataFrame | None:
    """Fused per-partition kernel: (doc_id, text) → positional chunk
    rows.  Applies the same min-size scan predicates as the frequency
    build (a doc too small to index is not phrase-searchable either);
    tokens are hashed at TOKEN level regardless of cfg.gram_size."""
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    if cfg.min_chars > 0:
        pdf = pdf[pdf["text"].fillna("").str.len() >= cfg.min_chars]
    toks = tokenize_series(pdf["text"], cfg)
    ids = pdf["doc_id"].to_numpy(np.int64)
    dls = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(pdf))
    if cfg.min_tokens > 0:
        keep = dls >= cfg.min_tokens
        toks = toks[keep]
        ids, dls = ids[keep], dls[keep]
    if dls.sum() == 0:
        return None
    if dls.max() > _MAX_POS:
        raise ValueError(
            f"document longer than {_MAX_POS} tokens cannot be "
            "position-indexed (positions are packed into 32 bits)"
        )
    if ids.max() > _MAX_POS:
        raise ValueError(
            f"doc id {int(ids.max())} exceeds 32 bits — packed "
            "(doc << 32 | pos) keys would alias it into another doc; "
            "shard the positional store by doc range (module docstring)"
        )
    from itertools import chain

    flat = np.asarray(list(chain.from_iterable(toks)), dtype=object)
    codes, uniques = pd.factorize(flat)
    uh = np.fromiter(
        (_hash_token(u) for u in uniques), dtype=np.int64, count=len(uniques)
    )
    term_h = uh[codes]
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), dls)
    doc_start = np.repeat(np.cumsum(dls) - dls, dls)
    pos = np.arange(len(flat), dtype=np.int64) - doc_start

    order = np.lexsort((pos, doc_idx, term_h))
    rows = _encode_pos_table(
        term_h[order], ids[doc_idx[order]], pos[order], max_chunk
    )
    return pd.DataFrame(rows, columns=_POS_COLS)


def build_position_segments(
    docs_with_ids: DataFrame, cfg: EngineConfig, max_chunk: int = 1 << 20
) -> DataFrame:
    """Single-pass fused positional build: (doc_id, text) →
    POS_SCHEMA chunk rows, one Arrow stage, no shuffle.  Write the
    result term-range sorted (``df.repartitionByRange('term')
    .sortWithinPartitions('term', 'first_doc')``) when materializing a
    store that phrase queries will term-prune against."""
    def sweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it if len(p)]
        if not parts:
            return
        whole = (
            pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        )
        out = _pos_partition_frame(whole, cfg, max_chunk)
        if out is not None:
            yield out

    return docs_with_ids.select("doc_id", "text").mapInPandas(
        sweep, schema=POS_SCHEMA
    )


def _decode_pos_chunk(row) -> tuple[np.ndarray, np.ndarray]:
    """One POS_SCHEMA row → (doc_ids per occurrence, abs positions)."""
    docs = varint.decode_deltas(bytes(row.doc_blob))
    cnts = varint.decode(bytes(row.cnt_blob)).astype(np.int64)
    d = varint.decode(bytes(row.pos_blob)).astype(np.int64)
    if len(d) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    c = np.cumsum(d)
    p_start = np.cumsum(cnts) - cnts
    base = c[p_start] - d[p_start]
    pos = c - np.repeat(base, cnts)
    return np.repeat(docs.astype(np.int64), cnts), pos


def _greedy_hits(starts_keys: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted packed match-start keys → (doc_ids, hits) under the
    leftmost non-overlapping rule (resume ``m`` tokens past a match —
    identical to phrase.count_phrase_hits)."""
    if len(starts_keys) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    docs = (starts_keys >> np.uint64(32)).astype(np.int64)
    if m == 1:  # occurrences never overlap: every start counts
        ud, cnt = np.unique(docs, return_counts=True)
        return ud, cnt.astype(np.int32)
    pos = (starts_keys & np.uint64(_MAX_POS)).astype(np.int64)
    out_d, out_c = [], []
    i, n = 0, len(docs)
    while i < n:
        d, c, last = docs[i], 0, -m
        j = i
        while j < n and docs[j] == d:
            if pos[j] >= last + m:
                c += 1
                last = int(pos[j])
            j += 1
        out_d.append(int(d))
        out_c.append(c)
        i = j
    return np.asarray(out_d, np.int64), np.asarray(out_c, np.int32)


def phrase_hits_from_positions(
    term_keys: dict, phrase_terms: list
) -> tuple[np.ndarray, np.ndarray]:
    """Core positional phrase matcher: ``term_keys`` maps term hash →
    SORTED packed (doc << 32 | pos) occurrence keys; ``phrase_terms``
    is the phrase's ordered (duplicates kept) term hashes.  A match
    start is a key k of term 0 with k+j present in term j's keys for
    every j — packed-key arithmetic never crosses a doc boundary
    because positions occupy the low 32 bits and are < doc length."""
    m = len(phrase_terms)
    starts = term_keys.get(int(phrase_terms[0]))
    if starts is None:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    starts = starts.astype(np.uint64, copy=True)
    for j in range(1, m):
        if len(starts) == 0:
            break
        keys_j = term_keys.get(int(phrase_terms[j]))
        if keys_j is None or len(keys_j) == 0:
            starts = starts[:0]
            break
        probe = starts + np.uint64(j)
        idx = np.searchsorted(keys_j, probe)
        np.minimum(idx, len(keys_j) - 1, out=idx)
        starts = starts[keys_j[idx] == probe]
    return _greedy_hits(starts, m)


def sloppy_phrase_hits_from_positions(
    term_keys: dict, phrase_terms: list, slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """Ordered sloppy phrase matcher (Lucene in-order SpanNear over the
    phrase terms): a match is positions p1 < p2 < ... < pm, one per
    term in order, with width pm - p1 <= slop + m - 1.  Greedy-earliest
    chaining from every start occurrence is COMPLETE — any valid
    chain's greedy counterpart has pointwise-smaller positions, hence
    smaller width — and vectorizes as one ``searchsorted`` per term
    over the packed (doc << 32 | pos) keys (packed arithmetic never
    crosses a doc: positions occupy the low 32 bits).  Returns
    ``(doc_ids, n_matching_starts)``; slop=0 reduces to the exact
    matcher's semantics (hit counts may differ on self-overlapping
    phrases — the exact matcher counts greedily non-overlapping)."""
    m = len(phrase_terms)
    starts = term_keys.get(int(phrase_terms[0]))
    if starts is None:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    starts = starts.astype(np.uint64, copy=True)
    cur = starts.copy()
    alive = np.ones(len(starts), dtype=bool)
    for j in range(1, m):
        keys_j = term_keys.get(int(phrase_terms[j]))
        if keys_j is None or len(keys_j) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int32)
        idx = np.searchsorted(keys_j, cur + np.uint64(1))
        ok = idx < len(keys_j)
        nxt = keys_j[np.minimum(idx, len(keys_j) - 1)]
        same = (nxt >> np.uint64(32)) == (cur >> np.uint64(32))
        alive &= ok & same
        cur[alive] = nxt[alive]
    width = (cur & np.uint64(0xFFFFFFFF)) - (
        starts & np.uint64(0xFFFFFFFF)
    )
    good = alive & (width <= np.uint64(slop + m - 1))
    if not good.any():
        return np.empty(0, np.int64), np.empty(0, np.int32)
    docs = (starts[good] >> np.uint64(32)).astype(np.int64)
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq, counts.astype(np.int32)


def _term_keys(pdf: pd.DataFrame) -> dict:
    """Chunk rows of one query group → {term hash: SORTED packed
    (doc << 32 | pos) occurrence keys} — the in-memory shape every
    positional kernel consumes."""
    term_keys: dict = {}
    for t, grp in pdf.groupby("term"):
        parts = []
        for row in grp.itertuples():
            d, p = _decode_pos_chunk(row)
            parts.append(
                (d.astype(np.uint64) << np.uint64(32)) | p.astype(np.uint64)
            )
        keys = np.concatenate(parts) if len(parts) > 1 else parts[0]
        keys.sort()
        term_keys[int(t)] = keys
    return term_keys


def phrase_search_positional(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    pos_store: DataFrame,
    cfg: EngineConfig,
) -> DataFrame:
    """Index-native phrase search: ``(query_id, text[, slop])`` queries
    over a positional store → ``(query_id, doc_id, hits)`` with
    hits ≥ 1 — the same contract as phrase.phrase_search_replica, with
    verification answered from position lists instead of candidate
    text.  An optional per-query ``slop`` column (default 0) switches a
    query to the ordered sloppy matcher (in-order SpanNear semantics:
    width ≤ slop + m - 1).  Plan: term-pruned store scan → broadcast
    join with the query-term table → ONE shuffle (groupBy query_id) →
    Arrow kernel.
    """
    qtoks = tokenize_series(queries_pdf["text"], cfg)
    slops = (
        queries_pdf["slop"].fillna(0).astype(int)
        if "slop" in queries_pdf.columns
        else pd.Series(0, index=queries_pdf.index)
    )
    qmeta, qterm = [], set()
    for qid, ts, slop in zip(queries_pdf["query_id"], qtoks, slops):
        if len(ts) == 0:
            continue
        hs = [int(_hash_token(t)) for t in ts]
        qmeta.append((int(qid), json.dumps(hs), int(slop)))
        qterm.update((int(qid), h) for h in set(hs))
    if not qmeta:
        return spark.createDataFrame([], "query_id long, doc_id long, hits int")

    qmeta_df = spark.createDataFrame(
        qmeta, "query_id long, terms_json string, slop int"
    )
    qterm_df = spark.createDataFrame(
        sorted(qterm), "query_id long, term long"
    )
    all_terms = sorted({t for _, t in qterm})
    hit_chunks = (
        pos_store.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterm_df), "term")
        .join(F.broadcast(qmeta_df), "query_id")
        .select(
            "query_id", "terms_json", "slop", "term",
            "doc_blob", "cnt_blob", "pos_blob",
        )
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "doc_id": pd.Series(dtype="int64"),
             "hits": pd.Series(dtype="int32")}
        )
        if len(pdf) == 0:
            return empty
        qid = int(pdf["query_id"].iloc[0])
        phrase_terms = json.loads(pdf["terms_json"].iloc[0])
        slop = int(pdf["slop"].iloc[0])
        term_keys = _term_keys(pdf)
        if slop > 0:
            docs, hits = sloppy_phrase_hits_from_positions(
                term_keys, phrase_terms, slop
            )
        else:
            docs, hits = phrase_hits_from_positions(term_keys, phrase_terms)
        keep = hits >= 1
        docs, hits = docs[keep], hits[keep]
        return pd.DataFrame(
            {"query_id": np.full(len(docs), qid, np.int64),
             "doc_id": docs, "hits": hits}
        )

    return hit_chunks.groupBy("query_id").applyInPandas(
        per_query, schema="query_id long, doc_id long, hits int"
    )


# ------------------------------------------------- proximity ranking


def min_pair_distance(
    keys_a: np.ndarray, keys_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc minimum token distance between two DISTINCT terms:
    sorted packed (doc << 32 | pos) keys for each term → (doc_ids,
    min |pos_a - pos_b|) over exactly the docs containing BOTH terms.

    One merge + one segmented min, no pair enumeration: in the merged
    per-doc position order the closest cross-term pair is always
    ADJACENT (any element strictly between a candidate pair forms a
    strictly closer pair with one of its ends — positions are unique
    within a doc, so the order is strict), so a single sorted merge of
    both key arrays followed by an adjacent-difference scan finds every
    per-doc minimum.  O((|A|+|B|) log) for the merge sort, O(|A|+|B|)
    after — the same cost class as the conjunctive intersection, and
    docs missing either term never produce a cross-label adjacency, so
    the AND semantics fall out for free.
    """
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if len(keys_a) == 0 or len(keys_b) == 0:
        return empty
    keys = np.concatenate([keys_a, keys_b])
    lab = np.empty(len(keys), np.int8)
    lab[: len(keys_a)] = 0
    lab[len(keys_a):] = 1
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    lab = lab[order]
    cross = (
        ((keys[1:] >> np.uint64(32)) == (keys[:-1] >> np.uint64(32)))
        & (lab[1:] != lab[:-1])
    )
    if not cross.any():
        return empty
    # same doc ⇒ the packed-key difference IS the position difference
    dist = (keys[1:][cross] - keys[:-1][cross]).astype(np.int64)
    docs = (keys[1:][cross] >> np.uint64(32)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
    return docs[starts], np.minimum.reduceat(dist, starts)


def proximity_search_positional(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    pos_store: DataFrame,
    cfg: EngineConfig,
    k: int = 10,
) -> DataFrame:
    """Index-native proximity ranking: each query is a pair of terms
    (the first two distinct tokens of ``text``), answered as the top-k
    docs by ascending minimum token distance between the terms —
    ``(query_id, rank, doc_id, min_dist)``, ties broken by ascending
    doc_id, only docs containing BOTH terms qualify.

    The positional store already paid for everything this needs: the
    plan is the phrase plan verbatim (term-pruned store scan →
    broadcast query-term join → ONE shuffle keyed by query_id → Arrow
    kernel), with the contiguity matcher swapped for the adjacent-merge
    distance kernel.  Reference analog: NIL locates candidates by
    n-gram co-occurrence (NGramBasedLocation.kt:10-15); proximity is
    the graded version of that co-occurrence signal, served from the
    index without re-reading text.
    """
    qtoks = tokenize_series(queries_pdf["text"], cfg)
    qmeta, qterm = [], set()
    for qid, ts in zip(queries_pdf["query_id"], qtoks):
        seen: list = []
        for t in ts:
            h = int(_hash_token(t))
            if h not in seen:
                seen.append(h)
            if len(seen) == 2:
                break
        if len(seen) < 2:
            raise ValueError(
                f"proximity query {qid!r} needs two distinct terms, "
                f"got {list(ts)!r}"
            )
        qmeta.append((int(qid), seen[0], seen[1]))
        qterm.update((int(qid), h) for h in seen)
    if not qmeta:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, min_dist long"
        )

    qmeta_df = spark.createDataFrame(
        qmeta, "query_id long, t1 long, t2 long"
    )
    qterm_df = spark.createDataFrame(sorted(qterm), "query_id long, term long")
    all_terms = sorted({t for _, t in qterm})
    hit_chunks = (
        pos_store.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterm_df), "term")
        .join(F.broadcast(qmeta_df), "query_id")
        .select(
            "query_id", "t1", "t2", "term",
            "doc_blob", "cnt_blob", "pos_blob",
        )
    )

    out_schema = "query_id long, rank int, doc_id long, min_dist long"

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "rank": pd.Series(dtype="int32"),
             "doc_id": pd.Series(dtype="int64"),
             "min_dist": pd.Series(dtype="int64")}
        )
        if len(pdf) == 0:
            return empty
        qid = int(pdf["query_id"].iloc[0])
        t1, t2 = int(pdf["t1"].iloc[0]), int(pdf["t2"].iloc[0])
        term_keys = _term_keys(pdf)
        ka = term_keys.get(t1)
        kb = term_keys.get(t2)
        if ka is None or kb is None:
            return empty
        docs, dist = min_pair_distance(ka, kb)
        top = np.lexsort((docs, dist))[: min(k, len(docs))]
        return pd.DataFrame(
            {"query_id": np.full(len(top), qid, np.int64),
             "rank": np.arange(1, len(top) + 1, dtype=np.int32),
             "doc_id": docs[top], "min_dist": dist[top]}
        )

    return hit_chunks.groupBy("query_id").applyInPandas(
        per_query, schema=out_schema
    )


# ------------------------------------------------ ordered span-near


def min_ordered_gap(
    keys_a: np.ndarray, keys_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc minimum ORDERED gap: for two distinct terms, the
    smallest ``pos_b - pos_a > 0`` over occurrences where B follows A
    in the same doc — the kernel under span-near ("B within W tokens
    after A") queries.  Returns (doc_ids, min_gap) over exactly the
    docs where B ever follows A.

    One merge + one carry-forward scan, no pair enumeration: in the
    merged per-doc position order, the best A for every B is the LAST
    A at or before it, so ``np.maximum.accumulate`` over the merged
    keys (A keys kept, B slots carrying the running A-max forward)
    yields every B's nearest preceding A in one vectorized pass.  A
    stale A carried across a doc boundary is dropped by an explicit
    high-bits (doc) comparison — the raw key difference alone is NOT a
    safe filter, because ``(d+1)<<32 | small_pos`` minus
    ``d<<32 | large_pos`` can be arbitrarily small (hypothesis found
    exactly this: A at (0,1), B at (1,0) → gap 2^32-1 but also e.g.
    gap 1 for larger positions).  A doc with no A yet compares against
    a -2^62 sentinel whose high bits match no doc.  Cost is
    O((|A|+|B|) log) for the merge, linear after, the same class as
    the unordered distance kernel.
    """
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if len(keys_a) == 0 or len(keys_b) == 0:
        return empty
    keys = np.concatenate([keys_a, keys_b]).astype(np.int64)
    lab_b = np.empty(len(keys), dtype=bool)
    lab_b[: len(keys_a)] = False
    lab_b[len(keys_a):] = True
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    lab_b = lab_b[order]
    sentinel = -(1 << 62)
    last_a = np.maximum.accumulate(np.where(lab_b, sentinel, keys))
    b_keys = keys[lab_b]
    b_last_a = last_a[lab_b]
    gaps = b_keys - b_last_a
    bdocs = (b_keys >> 32).astype(np.int64)
    # ordered pair only counts when its nearest preceding A is in the
    # SAME doc (high 32 bits equal); the sentinel's high bits match
    # no doc, so no-A-yet B's drop here too
    ok = (b_last_a >> 32) == b_keys >> 32
    if not ok.any():
        return empty
    gaps, bdocs = gaps[ok], bdocs[ok]
    starts = np.flatnonzero(np.r_[True, bdocs[1:] != bdocs[:-1]])
    return bdocs[starts], np.minimum.reduceat(gaps, starts)


def span_near_positional(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    pos_store: DataFrame,
    cfg: EngineConfig,
    window: int,
    k: int = 10,
) -> DataFrame:
    """Ordered span-near search (Lucene ``SpanNearQuery`` with
    in_order=true, two clauses): top-k docs where the query's second
    term follows its first within ``window`` tokens, ranked by
    ascending minimum ordered gap then doc_id —
    ``(query_id, rank, doc_id, min_gap)``.  Same plan as every
    positional query: term-pruned store scan → broadcast query-term
    join → ONE shuffle keyed by query_id → Arrow kernel."""
    if window < 1:
        raise ValueError(f"span_near window must be >= 1, got {window}")
    qtoks = tokenize_series(queries_pdf["text"], cfg)
    qmeta, qterm = [], set()
    for qid, ts in zip(queries_pdf["query_id"], qtoks):
        seen: list = []
        for t in ts:
            h = int(_hash_token(t))
            if h not in seen:
                seen.append(h)
            if len(seen) == 2:
                break
        if len(seen) < 2:
            raise ValueError(
                f"span_near query {qid!r} needs two distinct terms, "
                f"got {list(ts)!r}"
            )
        qmeta.append((int(qid), seen[0], seen[1]))
        qterm.update((int(qid), h) for h in seen)
    if not qmeta:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, min_gap long"
        )

    qmeta_df = spark.createDataFrame(qmeta, "query_id long, t1 long, t2 long")
    qterm_df = spark.createDataFrame(sorted(qterm), "query_id long, term long")
    all_terms = sorted({t for _, t in qterm})
    hit_chunks = (
        pos_store.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterm_df), "term")
        .join(F.broadcast(qmeta_df), "query_id")
        .select(
            "query_id", "t1", "t2", "term",
            "doc_blob", "cnt_blob", "pos_blob",
        )
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "rank": pd.Series(dtype="int32"),
             "doc_id": pd.Series(dtype="int64"),
             "min_gap": pd.Series(dtype="int64")}
        )
        if len(pdf) == 0:
            return empty
        qid = int(pdf["query_id"].iloc[0])
        t1, t2 = int(pdf["t1"].iloc[0]), int(pdf["t2"].iloc[0])
        term_keys = _term_keys(pdf)
        ka, kb = term_keys.get(t1), term_keys.get(t2)
        if ka is None or kb is None:
            return empty
        docs, gap = min_ordered_gap(ka, kb)
        keep = gap <= window
        docs, gap = docs[keep], gap[keep]
        top = np.lexsort((docs, gap))[: min(k, len(docs))]
        return pd.DataFrame(
            {"query_id": np.full(len(top), qid, np.int64),
             "rank": np.arange(1, len(top) + 1, dtype=np.int32),
             "doc_id": docs[top], "min_gap": gap[top]}
        )

    return hit_chunks.groupBy("query_id").applyInPandas(
        per_query, schema="query_id long, rank int, doc_id long, min_gap long"
    )


# ---------------------------------------------- minimal-window search


def min_window(
    occ_keys: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc LEFTMOST minimal window covering all m terms:
    ``occ_keys[i]`` is term i's sorted packed (doc << 32 | pos) keys;
    returns (doc_ids, win_start, win_len) over exactly the docs
    containing every term — the snippet-extraction primitive (the
    smallest text region a highlighter should show).

    Merge once, then the classic two-pointer sweep per candidate doc:
    advance the right edge until all m term counts are positive,
    shrink the left edge while coverage holds, record strict
    improvements (so ties keep the FIRST — leftmost — window).  The
    sweep is sequential by nature, but it runs only over docs that
    survive the conjunctive containment check, and its cost is the
    candidate docs' occurrence mass — the same bound every positional
    kernel here carries.  Precedent for a per-doc Python loop on a
    filtered residue: the LCS verify kernel (operators/clone.py), where
    filtration guarantees the loop input is small.
    """
    empty = (
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
    )
    m = len(occ_keys)
    if m == 0 or any(len(k) == 0 for k in occ_keys):
        return empty
    # candidate docs: contained in EVERY term's doc set
    doc_sets = [np.unique(k >> np.uint64(32)) for k in occ_keys]
    cand = doc_sets[0]
    for ds in doc_sets[1:]:
        if len(cand) == 0:
            return empty
        pos = np.searchsorted(ds, cand)
        np.minimum(pos, len(ds) - 1, out=pos)
        cand = cand[ds[pos] == cand]
    if len(cand) == 0:
        return empty

    keys = np.concatenate(occ_keys).astype(np.int64)
    labs = np.concatenate(
        [np.full(len(k), i, np.int32) for i, k in enumerate(occ_keys)]
    )
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    labs = labs[order]
    docs_all = keys >> 32
    # restrict the merged stream to candidate docs before looping
    pos = np.searchsorted(cand, docs_all)
    np.minimum(pos, len(cand) - 1, out=pos)
    keep = cand[pos] == docs_all
    keys = keys[keep]
    labs = labs[keep]
    docs_all = docs_all[keep]
    poss = keys & _MAX_POS

    out_d, out_s, out_w = [], [], []
    bounds = np.flatnonzero(np.r_[True, docs_all[1:] != docs_all[:-1]])
    bounds = np.append(bounds, len(docs_all))
    for bi in range(len(bounds) - 1):
        s, e = int(bounds[bi]), int(bounds[bi + 1])
        p = poss[s:e]
        lb = labs[s:e]
        need = m
        cnt = np.zeros(m, np.int64)
        best_w, best_s = None, None
        left = 0
        for right in range(len(p)):
            if cnt[lb[right]] == 0:
                need -= 1
            cnt[lb[right]] += 1
            while need == 0:
                w = int(p[right] - p[left])
                if best_w is None or w < best_w:
                    best_w, best_s = w, int(p[left])
                cnt[lb[left]] -= 1
                if cnt[lb[left]] == 0:
                    need += 1
                left += 1
        if best_w is not None:
            out_d.append(int(docs_all[s]))
            out_s.append(best_s)
            out_w.append(best_w)
    return (
        np.asarray(out_d, np.int64),
        np.asarray(out_s, np.int64),
        np.asarray(out_w, np.int64),
    )


def min_window_positional(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    pos_store: DataFrame,
    cfg: EngineConfig,
    k: int = 10,
) -> DataFrame:
    """Minimal-window search: per query (whitespace terms, duplicates
    collapsed), the top-k docs by the smallest token window containing
    ALL the query's terms — ``(query_id, rank, doc_id, win_start,
    win_len)``, ranked by (win_len, doc_id), win_start = leftmost
    minimal window.  This is the index-native form of snippet
    selection: the window bounds point a highlighter at the exact text
    region, and document text is never read to find it.  Same plan as
    every positional query (term-pruned scan → broadcast join → one
    query_id shuffle → Arrow kernel)."""
    qtoks = tokenize_series(queries_pdf["text"], cfg)
    qmeta, qterm = [], set()
    for qid, ts in zip(queries_pdf["query_id"], qtoks):
        hs = list(dict.fromkeys(int(_hash_token(t)) for t in ts))
        if not hs:
            continue
        qmeta.append((int(qid), json.dumps(hs)))
        qterm.update((int(qid), h) for h in hs)
    if not qmeta:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, doc_id long, win_start long, win_len long",
        )

    qmeta_df = spark.createDataFrame(qmeta, "query_id long, terms_json string")
    qterm_df = spark.createDataFrame(sorted(qterm), "query_id long, term long")
    all_terms = sorted({t for _, t in qterm})
    hit_chunks = (
        pos_store.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterm_df), "term")
        .join(F.broadcast(qmeta_df), "query_id")
        .select(
            "query_id", "terms_json", "term",
            "doc_blob", "cnt_blob", "pos_blob",
        )
    )
    schema = (
        "query_id long, rank int, doc_id long, win_start long, win_len long"
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "rank": pd.Series(dtype="int32"),
             "doc_id": pd.Series(dtype="int64"),
             "win_start": pd.Series(dtype="int64"),
             "win_len": pd.Series(dtype="int64")}
        )
        if len(pdf) == 0:
            return empty
        qid = int(pdf["query_id"].iloc[0])
        terms = json.loads(pdf["terms_json"].iloc[0])
        term_keys = _term_keys(pdf)
        occ = []
        for t in terms:
            kt = term_keys.get(int(t))
            if kt is None:
                return empty  # a term absent from the corpus: no doc
            occ.append(kt)
        docs, ws, wl = min_window(occ)
        top = np.lexsort((docs, wl))[: min(k, len(docs))]
        return pd.DataFrame(
            {"query_id": np.full(len(top), qid, np.int64),
             "rank": np.arange(1, len(top) + 1, dtype=np.int32),
             "doc_id": docs[top], "win_start": ws[top], "win_len": wl[top]}
        )

    return hit_chunks.groupBy("query_id").applyInPandas(
        per_query, schema=schema
    )
