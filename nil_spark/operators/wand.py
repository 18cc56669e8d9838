"""Block-Max WAND/MaxScore: document-at-a-time BM25 top-k over the
node-shared replica store.

The fifth serving path, and the literal traversal the design doc
promises ("BM25 top-k with block-max WAND", SURVEY.md §1): postings
are consumed in global doc order, a WAND-style sum-of-upper-bounds
test (Broder et al. CIKM'03) prunes candidates, per-block maxima let
whole doc ranges be skipped without decoding (BMW, Ding & Suel
SIGIR'11), and the term set is split MaxScore-style (Turtle & Flood
IPM'95) into *essential* and *non-essential* lists.  Reference analog:
the filter-then-verify staging of NILMain.kt:72-74 /
OptimizedCloneDetection.kt:20 — the cheap bound that keeps exact
scoring off most candidates — expressed as posting-cursor pruning
rather than candidate-set filtration.

Why the hybrid, not textbook pivot-at-a-time WAND: a pure Python/NumPy
engine pays ~100 µs of interpreter and numpy-dispatch overhead per
pivot step, and on realistic mixed-df queries the pivot advance is
capped by the nearest *hot-term* cursor, so textbook WAND degenerates
to ~2-doc steps (measured here: 28-50 s for 20 long queries, slower
than dense scoring).  The MaxScore split removes hot terms from the
traversal entirely — they are probed, not walked:

* essential terms (few, rare, high upper bound) are traversed in
  doc-ordered slabs of up to EVAL_SLAB postings — vectorized gather;
* a slab whose summed per-term BLOCK maxima cannot reach the running
  threshold is skipped wholesale (the block-max skip);
* per gathered candidate, essential-exact + non-essential upper
  bounds form the WAND bound; only candidates that can still reach
  the top-k are probed into the non-essential lists (one vectorized
  ``searchsorted`` per term per slab, never a cursor walk).

Where it sits among the serving paths (all rank-identical):

* ``topk_replica_resident`` — term-at-a-time dense accumulation;
  O(total touched postings) regardless of k.  Fastest when queries
  touch a modest posting mass.
* ``topk_replica_bmw`` (here) — document-at-a-time with skipping;
  walks only essential posting lists and probes the rest.  The shape
  that wins when hot posting lists are huge and k is small: cost is
  O(essential posting mass + probes), not O(total posting mass).  At
  10^12 turns a hot term's posting list is ~10^9 entries; the dense
  path must touch all of them, this path touches none of it beyond
  log-time probes for surviving candidates.

Exactness (same discipline as ``topk_maxscore``): a doc's score is
left unevaluated only when an upper bound on it is below
``threshold - MAXSCORE_MARGIN``, where ``threshold`` is the k-th
largest *raw* score among fully-evaluated docs (monotone nondecreasing
over the traversal, and the essential set only shrinks as it rises, so
every doc is either gathered while its terms are still essential or
provably under the bar).  A skipped doc's raw score therefore sits
more than MAXSCORE_MARGIN (1e-6) below the final k-th raw score;
rounding to SCORE_DECIMALS (1e-8 buckets) cannot close a 1e-6 gap, so
the rounded, doc_id-tie-broken top-k over evaluated docs equals the
exact answer.  Final ranking: round BEFORE rank, ties by ascending
doc_id — the repo-wide rank-identity pin.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nil_spark.config import EngineConfig
from nil_spark.operators.phrase import _membership
from nil_spark.operators.query import SCORE_DECIMALS
from nil_spark.operators.segments import (
    MAXSCORE_MARGIN,
    _load_replica,
    _published_arrays,
    _ReplicaView,
)

_BMW_ARRAY_NAMES = ("boffs", "blast", "bmax")

# worker-level cache: one live block index per worker (mmap views, so
# N workers on a node still share one physical copy)
_BMW_CACHE: dict = {}

_INF = np.iinfo(np.int64).max

# per-essential-term postings consumed per slab: large enough that
# numpy slice work dominates the per-iteration interpreter cost, small
# enough that the threshold still tightens between slabs
EVAL_SLAB = 1024


def build_block_index(view: _ReplicaView, block_size: int) -> tuple:
    """Per-term fixed-size posting blocks with skip metadata, computed
    in one vectorized pass over the replica arrays (no per-term loop).

    Returns ``(boffs, blast, bmax)``: term ``i`` owns blocks
    ``boffs[i]:boffs[i+1]``; block ``j`` covers postings
    ``[start_j, start_j + block_size)`` of the term's range and carries
    ``blast[j]`` (last doc id in the block — the skip pointer) and
    ``bmax[j]`` (max BM25 tf-normalization in the block — the block-max
    bound).  Blocks tile the global postings array contiguously, which
    is what lets ``np.maximum.reduceat`` compute every block max in one
    call.
    """
    offs = np.asarray(view.offs, dtype=np.int64)
    docs = view.docs
    tfn = view.tfn
    counts = np.diff(offs)
    if len(docs) == 0:
        z = np.zeros(len(counts) + 1, np.int64)
        return z, np.empty(0, np.int64), np.empty(0, np.float64)
    nblocks = (counts + block_size - 1) // block_size
    boffs = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(nblocks, out=boffs[1:])
    total = int(boffs[-1])
    term_of_block = np.repeat(np.arange(len(counts), dtype=np.int64), nblocks)
    within = np.arange(total, dtype=np.int64) - np.repeat(boffs[:-1], nblocks)
    bstarts = offs[term_of_block] + within * block_size
    bends = np.minimum(bstarts + block_size, offs[term_of_block + 1])
    blast = np.asarray(docs)[bends - 1]
    # blocks tile [0, len(docs)): bends[j] == bstarts[j+1], so reduceat
    # segments are exactly the blocks (last segment runs to the end)
    bmax = np.maximum.reduceat(np.asarray(tfn), bstarts)
    return boffs, blast.astype(np.int64), bmax.astype(np.float64)


def _load_block_index(
    paths: tuple, avgdl: float, k1: float, b: float, block_size: int
) -> tuple:
    """Node-shared block-index attach: first worker builds from the
    (already node-shared) replica view and publishes three flat arrays;
    everyone else mmaps them — same publish-once/mmap-everywhere store
    as the replica itself."""
    key = (("bmw", block_size), paths, round(avgdl, 9), k1, b)
    ent = _BMW_CACHE.get(key)
    if ent is not None:
        return ent
    view = _load_replica(paths, avgdl, k1, b)
    arrays = _published_arrays(
        key,
        paths,
        lambda: build_block_index(view, block_size),
        names=_BMW_ARRAY_NAMES,
    )
    _BMW_CACHE.clear()  # one live block index per worker
    _BMW_CACHE[key] = arrays
    return arrays


def wand_query(
    view: _ReplicaView,
    bidx: tuple,
    tlist: list,
    k: int,
    stats: dict | None = None,
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> tuple:
    """Block-Max WAND/MaxScore traversal for one query (module
    docstring has the full design and exactness argument).

    ``tlist`` is ``[(term, idf), ...]``; returns ``(doc_ids, scores)``
    rounded and ranked (round-before-rank, ties by ascending doc_id).
    ``stats`` (optional) accumulates ``evaluated`` (docs gathered and
    scored) and ``candidates`` (total postings under the query terms)
    so tests and benches can see the pruning rate.

    ``allowed`` (optional) is a SORTED int64 array of admissible doc
    ids — the pre-filter of filtered search (a metadata predicate
    pushed into retrieval).  Gathered candidates outside it are dropped
    before scoring completes, so the threshold rises only on admissible
    docs and the final top-k is exactly the top-k over the filtered
    corpus.  Pruning stays sound: every skip bound is an upper bound
    over ALL docs, hence over the allowed subset too.

    ``excluded`` (optional) is the complement filter — a SORTED int64
    array of doc ids to DROP (live-docs tombstones, operators/deletes).
    Same admission point and the same soundness argument as
    ``allowed``: the threshold rises only on live docs, and every skip
    bound remains an upper bound over the live subset.
    """
    boffs, blast, bmax = bidx
    terms_arr = view.terms
    offs = view.offs
    # plain-ndarray views over the (possibly mmap'd) buffers: slicing
    # np.memmap pays __array_finalize__ on EVERY op (~2 µs, measured as
    # ~30% of kernel time); asarray shares the same pages but slices at
    # base-class speed
    docs_nd = np.asarray(view.docs)
    tfn_nd = np.asarray(view.tfn)
    blast_nd = np.asarray(blast)
    bmax_nd = np.asarray(bmax)

    t_docs: list = []
    t_tfn: list = []
    t_idf: list = []
    t_blast: list = []
    t_bmax: list = []
    ubs: list = []
    for t, idf in tlist:
        i = int(np.searchsorted(terms_arr, t))
        if i >= len(terms_arr) or terms_arr[i] != t:
            continue
        s, e = int(offs[i]), int(offs[i + 1])
        bs, be = int(boffs[i]), int(boffs[i + 1])
        t_docs.append(docs_nd[s:e])
        t_tfn.append(tfn_nd[s:e])
        t_idf.append(float(idf))
        t_blast.append(blast_nd[bs:be])
        t_bmax.append(bmax_nd[bs:be])
        ubs.append(float(idf) * float(bmax_nd[bs:be].max()))
    n = len(t_docs)
    if stats is not None:
        stats["candidates"] = stats.get("candidates", 0) + sum(
            len(d) for d in t_docs
        )
    if n == 0 or (allowed is not None and len(allowed) == 0):
        return np.empty(0, np.int64), np.empty(0, np.float64)

    lens = [len(d) for d in t_docs]
    cur = [0] * n
    ubs_arr = np.asarray(ubs, np.float64)
    # the essential split is a suffix of the ub-ascending term order:
    # terms in ub_order[:split] cannot, even all together, lift any doc
    # over the threshold (cumulative bound under it) — probed, not
    # walked (MaxScore).  split only grows as the threshold rises.
    ub_order = [int(x) for x in np.argsort(ubs_arr, kind="stable")]
    ub_csum = np.cumsum(ubs_arr[ub_order])
    topk = np.empty(0, np.float64)  # k largest RAW scores evaluated so far
    out_docs: list = []
    out_scores: list = []
    n_eval = 0

    def _local_ub(t: int, lo: int, hi: int) -> float:
        """idf × max block-max over blocks intersecting [lo, hi]; 0.0
        when the term has no postings ≥ lo."""
        bl = t_blast[t]
        a = int(np.searchsorted(bl, lo))
        if a >= len(bl):
            return 0.0
        b = int(np.searchsorted(bl, hi))
        if b >= len(bl):
            b = len(bl) - 1
        return t_idf[t] * float(t_bmax[t][a : b + 1].max())

    while True:
        threshold = float(topk.min()) if len(topk) >= k else -math.inf
        split = int(np.searchsorted(ub_csum, threshold - MAXSCORE_MARGIN))
        if split >= n:
            break  # even all terms together cannot reach the top-k
        ess = ub_order[split:]
        ness = ub_order[:split]
        # cumulative bound of everything probed rather than walked —
        # O(1), part of every candidate's WAND bound
        ub_rest = float(ub_csum[split - 1]) if split else 0.0

        # slab extent: from the smallest essential cursor doc out to
        # the nearest essential EVAL_SLAB-th posting (min across terms
        # bounds every gather to one slice)
        lo = _INF
        hi = _INF
        for t in ess:
            c = cur[t]
            if c >= lens[t]:
                continue
            d0 = int(t_docs[t][c])
            if d0 < lo:
                lo = d0
            dh = int(t_docs[t][min(c + EVAL_SLAB, lens[t]) - 1])
            if dh < hi:
                hi = dh
        if lo == _INF:
            break  # essential lists exhausted
        if hi < lo:
            hi = lo

        # block-max slab skip (BMW): if the essential terms' block
        # maxima over [lo, hi] plus everything probe-able cannot reach
        # the threshold, skip the slab without gathering a posting
        bound = ub_rest
        ok = bound >= threshold - MAXSCORE_MARGIN
        if not ok:
            for t in reversed(ess):  # descending ub: fastest early-out
                bound += _local_ub(t, lo, hi)
                if bound >= threshold - MAXSCORE_MARGIN:
                    ok = True
                    break
        if not ok:
            for t in ess:
                c = cur[t]
                cur[t] = c + int(
                    np.searchsorted(t_docs[t][c:], hi, side="right")
                )
            continue

        # gather the essential slab [lo, hi] — the only cursor walk
        parts_d: list = []
        parts_s: list = []
        for t in ess:
            c = cur[t]
            z = c + int(np.searchsorted(t_docs[t][c:], hi, side="right"))
            if z > c:
                parts_d.append(t_docs[t][c:z])
                parts_s.append(t_idf[t] * t_tfn[t][c:z])
            cur[t] = z
        if len(parts_d) == 1:
            u = parts_d[0]
            ess_sc = parts_s[0]
        else:
            u, inv = np.unique(np.concatenate(parts_d), return_inverse=True)
            ess_sc = np.zeros(len(u), np.float64)
            np.add.at(ess_sc, inv, np.concatenate(parts_s))
        n_eval += len(u)

        if allowed is not None and len(u):
            pos = np.searchsorted(allowed, u)
            np.minimum(pos, len(allowed) - 1, out=pos)
            adm = allowed[pos] == u
            u = u[adm]
            ess_sc = ess_sc[adm]
            if len(u) == 0:
                continue
        if excluded is not None and len(excluded) and len(u):
            dead = _membership(excluded, u)
            if dead.any():
                u = u[~dead]
                ess_sc = ess_sc[~dead]
                if len(u) == 0:
                    continue

        # WAND candidate bound: essential-exact + probed-terms bound.
        # Survivors get their non-essential contributions looked up by
        # one vectorized searchsorted per term (full list, no cursor —
        # correct even after a term left the essential set).
        if threshold > -math.inf:
            live_m = ess_sc + ub_rest >= threshold - MAXSCORE_MARGIN
            live = u[live_m]
            sc = ess_sc[live_m]
        else:
            live = u
            sc = ess_sc
        if len(live):
            for t in ness:
                dlist = t_docs[t]
                pos = np.searchsorted(dlist, live)
                np.minimum(pos, lens[t] - 1, out=pos)
                hit = dlist[pos] == live
                if hit.any():
                    sc[hit] += t_idf[t] * t_tfn[t][pos[hit]]
            out_docs.append(live)
            out_scores.append(sc)
            pool = np.concatenate((topk, sc))
            if len(pool) > k:
                pool = np.partition(pool, len(pool) - k)[len(pool) - k :]
            topk = pool

    if stats is not None:
        stats["evaluated"] = stats.get("evaluated", 0) + n_eval
    if not out_docs:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs_arr = np.concatenate(out_docs)
    sc = np.round(np.concatenate(out_scores), SCORE_DECIMALS)
    top = np.lexsort((docs_arr, -sc))[: min(k, len(docs_arr))]
    return docs_arr[top], sc[top]


def topk_replica_bmw(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list,
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    n_splits: int | None = None,
    block_size: int = 128,
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> DataFrame:
    """Distributed Block-Max WAND top-k: same replica topology as
    ``topk_replica_resident`` (index node-shared via mmap, the QUERY
    batch is what Spark partitions — ``parallelize`` slices it into
    exactly ``n_splits`` pieces, zero shuffle), but the per-query
    kernel is the document-at-a-time BMW traversal instead of dense
    term-at-a-time accumulation.  Rank-identical to every other path.

    ``allowed`` (optional) makes this FILTERED search: an int64 array
    of admissible doc ids (any order, deduped here) shipped to workers
    as a torrent broadcast — one copy per executor, the right shape for
    selective predicates (the common case: a tenant, a language, a
    date range).  For filters too large to broadcast, publish the
    sorted id array node-shared exactly like the replica arrays
    (``_published_arrays``) and mmap it in the kernel — same
    decode-once/share-everywhere discipline; not needed at gate scale.
    Corpus statistics (n_docs, avgdl, df→idf) deliberately stay
    UNFILTERED: scores of surviving docs are identical to the
    unfiltered engine's, so a cached unfiltered answer whose top-k all
    pass the predicate is still valid — standard filtered-search
    semantics (Lucene's FilteredQuery does the same).
    """
    from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series

    k1, b = cfg.bm25_k1, cfg.bm25_b
    df_map = dict(
        zip(
            termdict_pdf["term"].astype(np.int64),
            termdict_pdf["df"].astype(np.int64),
        )
    )
    paths = tuple(sorted(shard_paths))
    n_splits = n_splits or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    allowed_bc = (
        spark.sparkContext.broadcast(
            np.unique(np.asarray(allowed, dtype=np.int64))
        )
        if allowed is not None
        else None
    )
    excluded_bc = (
        spark.sparkContext.broadcast(
            np.unique(np.asarray(excluded, dtype=np.int64))
        )
        if excluded is not None and len(excluded)
        else None
    )

    qtoks = tokenize_series(queries_pdf["text"], cfg)
    rows = []
    for (qid, kk), ts in zip(
        zip(queries_pdf["query_id"], queries_pdf["k"]), qtoks
    ):
        th = np.unique(terms_for_tokens(ts, cfg))
        tl = [
            (
                int(t),
                math.log(
                    1.0 + (n_docs - df_map[int(t)] + 0.5) / (df_map[int(t)] + 0.5)
                ),
            )
            for t in th
            if int(t) in df_map
        ]
        if tl:
            rows.append((int(qid), int(kk), json.dumps(tl)))
    qdf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_splits),
        "query_id long, k int, terms_json string",
    )

    def per_split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        view = None
        bidx = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if view is None:
                view = _load_replica(paths, avgdl, k1, b)
                bidx = _load_block_index(paths, avgdl, k1, b, block_size)
            adm = allowed_bc.value if allowed_bc is not None else None
            exc = excluded_bc.value if excluded_bc is not None else None
            out_q, out_r, out_d, out_s = [], [], [], []
            for qid, kk, tj in zip(
                pdf["query_id"], pdf["k"], pdf["terms_json"]
            ):
                d, s = wand_query(
                    view, bidx, json.loads(tj), int(kk), allowed=adm,
                    excluded=exc,
                )
                out_q.extend([int(qid)] * len(d))
                out_r.extend(range(1, len(d) + 1))
                out_d.extend(d.tolist())
                out_s.extend(s.tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "rank": out_r, "doc_id": out_d, "bm25": out_s}
            )

    # each query lives in exactly one split: the in-kernel rounded,
    # tie-broken top-k IS the final answer — single zero-shuffle stage
    return qdf.mapInPandas(
        per_split, schema="query_id long, rank int, doc_id long, bm25 double"
    )
