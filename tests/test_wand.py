"""Block-Max WAND serving path: rank identity, block-index integrity,
pruning effectiveness, and the zero-shuffle plan shape.

The WAND kernel is the one serving path whose correctness depends on
per-term posting order (cursor seeks are ``searchsorted``), so this
file also pins the canonical replica layout: merged per-term doc lists
are sorted even when shard doc-ranges interleave (upstream
``repartition`` scrambles range-contiguity).
"""

from __future__ import annotations

import glob
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    _build_replica_arrays,
    _ReplicaView,
    build_partial_segments,
)
from nil_spark.operators.wand import (
    build_block_index,
    topk_replica_bmw,
    wand_query,
)
from nil_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    gen_queries,
    gen_transcripts,
)
from nil_spark.testing.oracle import OracleIndex

CFG = EngineConfig(gram_size=1)


@pytest.fixture(scope="module")
def wand_setup(spark, transcripts_1k, tmp_path_factory, queries_1k):
    """Shards built from a REPARTITIONED frame so shard doc-ranges
    interleave — the layout that breaks any path assuming shard order
    equals doc order."""
    shard_dir = str(tmp_path_factory.mktemp("wand_shards") / "shards")
    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    build_partial_segments(docs.repartition(6), CFG).write.parquet(shard_dir)
    raw = spark.read.parquet(shard_dir)
    st = raw.filter(F.col("term") == DOCSTAT_SENTINEL).agg(
        F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
    ).collect()[0]
    n_docs, avgdl = int(st["n"]), float(st["s"]) / int(st["n"])
    termdict = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
        .toPandas()
    )
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))
    return paths, termdict, n_docs, avgdl


def _mk_view(rng, vocab=24, ndocs=300):
    docs_l, tfn_l, offs = [], [], [0]
    for _ in range(vocab):
        n = int(rng.integers(3, 90))
        d = np.sort(rng.choice(ndocs, size=n, replace=False)).astype(np.int64)
        docs_l.append(d)
        tfn_l.append(rng.random(n) + 0.05)
        offs.append(offs[-1] + n)
    return _ReplicaView(
        np.arange(vocab, dtype=np.int64),
        np.asarray(offs, np.int64),
        np.concatenate(docs_l),
        np.concatenate(tfn_l),
    ), ndocs


def test_block_index_matches_naive():
    """Blocks tile each term's posting range; per-block last-doc and
    max-tfn equal a naive per-term loop."""
    rng = np.random.default_rng(11)
    view, _ = _mk_view(rng)
    for bs in (1, 4, 7, 64):
        boffs, blast, bmax = build_block_index(view, bs)
        for i in range(len(view.terms)):
            s, e = int(view.offs[i]), int(view.offs[i + 1])
            d, t = view.docs[s:e], view.tfn[s:e]
            exp_last, exp_max = [], []
            for j in range(0, e - s, bs):
                exp_last.append(int(d[min(j + bs, e - s) - 1]))
                exp_max.append(float(t[j : j + bs].max()))
            got_l = blast[boffs[i] : boffs[i + 1]]
            got_m = bmax[boffs[i] : boffs[i + 1]]
            np.testing.assert_array_equal(got_l, exp_last)
            np.testing.assert_allclose(got_m, exp_max)


def test_wand_kernel_fuzz_vs_naive():
    """300 random (query, k) trials: the BMW traversal must reproduce
    the naive full-scoring top-k (round-before-rank, doc_id ties)
    exactly — docs AND scores."""
    from nil_spark.operators.query import SCORE_DECIMALS

    rng = np.random.default_rng(13)
    view, ndocs = _mk_view(rng)
    bidx = build_block_index(view, 8)

    def naive(tlist, k):
        sc = np.zeros(ndocs)
        for t, idf in tlist:
            e = view.get(t)
            if e is not None:
                sc[e[0]] += idf * e[1]
        nz = np.flatnonzero(sc > 0)
        s = np.round(sc[nz], SCORE_DECIMALS)
        o = np.lexsort((nz, -s))[:k]
        return nz[o], s[o]

    for _ in range(300):
        nt = int(rng.integers(1, 9))
        tl = [
            (int(t), float(rng.random() * 3 + 0.05))
            for t in rng.choice(len(view.terms), size=nt, replace=False)
        ]
        k = int(rng.integers(1, 20))
        gd, gs = wand_query(view, bidx, tl, k)
        ed, es = naive(tl, k)
        assert list(gd) == list(ed), (tl, k)
        np.testing.assert_allclose(gs, es)


def test_merged_replica_per_term_doc_order(wand_setup):
    """The canonical replica layout: per-term postings sorted by doc id
    even when shard doc-ranges interleave (regression for the
    shard-order concat in _merge_flat_shards — the dense path never
    notices, every searchsorted path silently returns garbage)."""
    paths, _, _, avgdl = wand_setup
    terms, offs, docs, _ = _build_replica_arrays(
        tuple(paths), avgdl, CFG.bm25_k1, CFG.bm25_b
    )
    tob = np.repeat(np.arange(len(terms)), np.diff(offs))
    bad = (np.diff(docs) < 0) & (np.diff(tob) == 0)
    assert not bad.any(), f"{int(bad.sum())} unsorted within-term steps"


def test_bmw_rank_identity_vs_oracle(spark, transcripts_1k, queries_1k,
                                     wand_setup, tmp_path, monkeypatch):
    """Distributed BMW top-k == pinned-hash oracle, at a block size
    small enough to force multi-block skipping."""
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    paths, termdict, n_docs, avgdl = wand_setup
    got = (
        topk_replica_bmw(
            spark, queries_1k, paths, termdict, n_docs, avgdl, CFG, block_size=8
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        OracleIndex(transcripts_1k, CFG)
        .topk_frame(queries_1k)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["query_id"].values == exp["query_id"].values).all()
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-6)


def test_bmw_prunes_most_candidates(spark, transcripts_1k, queries_1k,
                                    wand_setup, tmp_path, monkeypatch):
    """The point of BMW: with small k, most candidate postings are
    skipped without evaluation.  Requires stats over real queries —
    evaluated docs must be well under the candidate posting mass."""
    from nil_spark.operators.segments import _load_replica
    from nil_spark.operators.wand import _load_block_index

    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    paths, termdict, n_docs, avgdl = wand_setup
    key = tuple(sorted(paths))
    view = _load_replica(key, avgdl, CFG.bm25_k1, CFG.bm25_b)
    bidx = _load_block_index(key, avgdl, CFG.bm25_k1, CFG.bm25_b, 16)
    dfm = dict(
        zip(termdict["term"].astype(np.int64), termdict["df"].astype(np.int64))
    )
    stats: dict = {}
    toks = tokenize_series(queries_1k["text"], CFG)
    for ts in toks:
        th = np.unique(terms_for_tokens(ts, CFG))
        tl = [
            (
                int(t),
                math.log(1.0 + (n_docs - dfm[int(t)] + 0.5) / (dfm[int(t)] + 0.5)),
            )
            for t in th
            if int(t) in dfm
        ]
        wand_query(view, bidx, tl, 3, stats=stats)  # small k → deep pruning
    assert stats["candidates"] > 0
    ratio = stats["evaluated"] / stats["candidates"]
    assert ratio < 0.7, (
        f"BMW evaluated {stats['evaluated']}/{stats['candidates']} "
        f"candidate postings ({ratio:.2f}) — pruning is not engaging"
    )


def test_bmw_serving_zero_shuffle(spark, queries_1k, wand_setup):
    """Same plan contract as the resident path: each query lives in
    exactly one parallelized split and the kernel emits the final
    ranked rows — the job must contain zero shuffle Exchanges."""
    paths, termdict, n_docs, avgdl = wand_setup
    df = topk_replica_bmw(
        spark, queries_1k, paths, termdict, n_docs, avgdl, CFG
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        l for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert not shuffles, "expected zero-shuffle job:\n" + "\n".join(shuffles)


# -------------------------------------------------- filtered serving


def test_wand_kernel_filtered_fuzz_vs_naive():
    """200 random (query, k, allowed-subset) trials: filtered BMW must
    equal the naive full scoring restricted to the allowed docs —
    including empty and full-corpus filters."""
    from nil_spark.operators.query import SCORE_DECIMALS

    rng = np.random.default_rng(29)
    view, ndocs = _mk_view(rng)
    bidx = build_block_index(view, 8)

    def naive(tlist, k, allowed):
        sc = np.zeros(ndocs)
        for t, idf in tlist:
            e = view.get(t)
            if e is not None:
                sc[e[0]] += idf * e[1]
        nz = np.flatnonzero(sc > 0)
        nz = nz[np.isin(nz, allowed)]
        s = np.round(sc[nz], SCORE_DECIMALS)
        o = np.lexsort((nz, -s))[:k]
        return nz[o], s[o]

    for trial in range(200):
        nt = int(rng.integers(1, 9))
        tl = [
            (int(t), float(rng.random() * 3 + 0.05))
            for t in rng.choice(len(view.terms), size=nt, replace=False)
        ]
        k = int(rng.integers(1, 20))
        if trial % 20 == 0:
            allowed = np.empty(0, np.int64)
        elif trial % 20 == 1:
            allowed = np.arange(ndocs, dtype=np.int64)
        else:
            sz = int(rng.integers(1, ndocs))
            allowed = np.sort(
                rng.choice(ndocs, size=sz, replace=False)
            ).astype(np.int64)
        gd, gs = wand_query(view, bidx, tl, k, allowed=allowed)
        ed, es = naive(tl, k, allowed)
        assert list(gd) == list(ed), (tl, k, len(allowed))
        np.testing.assert_allclose(gs, es)


def test_bmw_filtered_distributed(spark, queries_1k, wand_setup, tmp_path,
                                  monkeypatch):
    """Distributed filtered serving == the unfiltered path with an
    exhaustive k, post-filtered and re-ranked (the unfiltered path is
    itself oracle-pinned above)."""
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    paths, termdict, n_docs, avgdl = wand_setup
    allowed = np.arange(0, n_docs, 3, dtype=np.int64)  # every third doc
    q = queries_1k.copy()

    got = (
        topk_replica_bmw(
            spark, q, paths, termdict, n_docs, avgdl, CFG,
            block_size=8, allowed=allowed,
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert set(got["doc_id"]).issubset(set(allowed.tolist()))

    deep = q.copy()
    deep["k"] = n_docs
    full = topk_replica_bmw(
        spark, deep, paths, termdict, n_docs, avgdl, CFG, block_size=8
    ).toPandas()
    full = full[full["doc_id"].isin(allowed)]
    exp_rows = []
    for qid, grp in full.groupby("query_id"):
        grp = grp.sort_values(
            ["bm25", "doc_id"], ascending=[False, True]
        ).head(int(q.loc[q["query_id"] == qid, "k"].iloc[0]))
        for r, row in enumerate(grp.itertuples(), start=1):
            exp_rows.append((qid, r, row.doc_id, row.bm25))
    exp = (
        __import__("pandas")
        .DataFrame(exp_rows, columns=["query_id", "rank", "doc_id", "bm25"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["query_id"].values == exp["query_id"].values).all()
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    np.testing.assert_allclose(got["bm25"].values, exp["bm25"].values)
