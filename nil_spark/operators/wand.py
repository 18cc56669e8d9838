"""Block-Max WAND: document-at-a-time BM25 top-k over the node-shared
replica store.

The fifth serving path, and the literal traversal the design doc
promises ("BM25 top-k with block-max WAND", SURVEY.md §1): posting
cursors walk document-at-a-time, a pivot is selected from term upper
bounds (WAND, Broder et al. CIKM'03), and per-block maxima refine the
bound so whole blocks are skipped without decoding (BMW, Ding & Suel
SIGIR'11).  Reference analog: the filter-then-verify staging of
NILMain.kt:72-74 / OptimizedCloneDetection.kt:20 — the cheap bound that
keeps exact scoring off most candidates — expressed as posting-cursor
pruning rather than candidate-set filtration.

Where it sits among the serving paths (all rank-identical):

* ``topk_replica_resident`` — term-at-a-time dense accumulation;
  O(total touched postings) regardless of k.  Fastest when queries
  touch a modest posting mass (this corpus).
* ``topk_replica_bmw`` (here) — document-at-a-time with skipping;
  evaluates only docs whose bound can reach the running top-k.  The
  shape that wins when posting lists are huge and k is small: cost is
  O(evaluated docs · T log n), not O(posting mass).  At 10^12 turns a
  hot term's posting list is ~10^9 entries; the dense path must touch
  all of them, BMW touches the blocks that matter.

Exactness (same discipline as ``topk_maxscore``): a doc is skipped
only when an upper bound on its total score is below
``threshold - MAXSCORE_MARGIN``, where ``threshold`` is the k-th
largest *raw* score among fully-evaluated docs (monotone nondecreasing
over the traversal).  A skipped doc's raw score therefore sits more
than MAXSCORE_MARGIN (1e-6) below the final k-th raw score; rounding
to SCORE_DECIMALS (1e-8 buckets) cannot close a 1e-6 gap, so the
rounded, doc_id-tie-broken top-k over evaluated docs equals the exact
answer.  Final ranking: round BEFORE rank, ties by ascending doc_id —
the repo-wide rank-identity pin.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nil_spark.config import EngineConfig
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
) -> tuple:
    """Block-Max WAND traversal for one query.

    ``tlist`` is ``[(term, idf), ...]``; returns ``(doc_ids, scores)``
    rounded and ranked (round-before-rank, ties by ascending doc_id).
    ``stats`` (optional) accumulates ``evaluated`` (docs fully scored)
    and ``candidates`` (total postings under the query terms) so tests
    and benches can see the pruning rate.
    """
    import heapq

    boffs, blast, bmax = bidx
    terms_arr = view.terms
    offs = view.offs
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
        t_docs.append(view.docs[s:e])
        t_tfn.append(view.tfn[s:e])
        t_idf.append(float(idf))
        t_blast.append(blast[bs:be])
        t_bmax.append(bmax[bs:be])
        ubs.append(float(idf) * float(bmax[bs:be].max()))
    n = len(t_docs)
    if stats is not None:
        stats["candidates"] = stats.get("candidates", 0) + sum(
            len(d) for d in t_docs
        )
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    lens = [len(d) for d in t_docs]
    cur = [0] * n
    curdoc = np.fromiter((int(d[0]) for d in t_docs), np.int64, count=n)
    ubs_arr = np.asarray(ubs, np.float64)
    heap: list = []  # min-heap of raw scores of evaluated docs, size k
    out_docs: list = []
    out_scores: list = []

    def _seek(t: int, target: int) -> None:
        j = cur[t] + int(np.searchsorted(t_docs[t][cur[t]:], target))
        cur[t] = j
        curdoc[t] = int(t_docs[t][j]) if j < lens[t] else _INF

    while True:
        threshold = heap[0] if len(heap) >= k else -math.inf
        order = np.argsort(curdoc, kind="stable")
        if curdoc[order[0]] == _INF:
            break
        # pivot: shortest prefix (by current doc) whose summed term
        # upper bounds could still reach the threshold
        csum = np.cumsum(ubs_arr[order])
        live = np.flatnonzero(csum >= threshold - MAXSCORE_MARGIN)
        if len(live) == 0:
            break  # even all terms together cannot reach the top-k
        p = int(live[0])
        pivot = int(curdoc[order[p]])
        if pivot == _INF:
            break
        # fold in every term already sitting on the pivot doc (their
        # contribution is real, not just a bound)
        while p + 1 < n and int(curdoc[order[p + 1]]) == pivot:
            p += 1
        prefix = [int(x) for x in order[: p + 1]]
        next_cap = int(curdoc[order[p + 1]]) if p + 1 < n else _INF

        # block-max refinement: exact per-block ceiling at the pivot
        bound = 0.0
        nshallow = _INF
        for t in prefix:
            bi = int(np.searchsorted(t_blast[t], pivot))
            if bi >= len(t_blast[t]):
                continue  # term has no postings >= pivot
            bound += t_idf[t] * float(t_bmax[t][bi])
            bl = int(t_blast[t][bi])
            if bl < nshallow:
                nshallow = bl
        if bound >= threshold - MAXSCORE_MARGIN:
            # evaluate the pivot exactly across the prefix
            s = 0.0
            for t in prefix:
                _seek(t, pivot)
                j = cur[t]
                if j < lens[t] and int(t_docs[t][j]) == pivot:
                    s += t_idf[t] * float(t_tfn[t][j])
                    cur[t] = j + 1
                    curdoc[t] = (
                        int(t_docs[t][j + 1]) if j + 1 < lens[t] else _INF
                    )
            out_docs.append(pivot)
            out_scores.append(s)
            if len(heap) < k:
                heapq.heappush(heap, s)
            elif s > heap[0]:
                heapq.heapreplace(heap, s)
        else:
            # every doc in [pivot, min(nshallow, next_cap - 1)] is
            # bounded by `bound` (< threshold - margin): only prefix
            # terms can contain docs below next_cap, and each one's
            # contribution there is capped by its current block max.
            # Skip the whole range without decoding.
            d2 = nshallow + 1 if nshallow != _INF else _INF
            if next_cap < d2:
                d2 = next_cap
            if d2 <= pivot:
                d2 = pivot + 1
            for t in prefix:
                _seek(t, d2)

    if stats is not None:
        stats["evaluated"] = stats.get("evaluated", 0) + len(out_docs)
    if not out_docs:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs_arr = np.asarray(out_docs, np.int64)
    sc = np.round(np.asarray(out_scores, np.float64), SCORE_DECIMALS)
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
) -> DataFrame:
    """Distributed Block-Max WAND top-k: same replica topology as
    ``topk_replica_resident`` (index node-shared via mmap, the QUERY
    batch is what Spark partitions — ``parallelize`` slices it into
    exactly ``n_splits`` pieces, zero shuffle), but the per-query
    kernel is the document-at-a-time BMW traversal instead of dense
    term-at-a-time accumulation.  Rank-identical to every other path.
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
            out_q, out_r, out_d, out_s = [], [], [], []
            for qid, kk, tj in zip(
                pdf["query_id"], pdf["k"], pdf["terms_json"]
            ):
                d, s = wand_query(view, bidx, json.loads(tj), int(kk))
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
