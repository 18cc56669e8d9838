"""Verified search serving (operators/search_verify.py): the
filter-then-verify pass over BM25 candidates, pinned against a
pure-Python oracle that restates the reference staging
(OptimizedCloneDetection.kt:17-56 applied to the query path):
tier-1 distinct-shingle overlap ≥ δ fast-accept, residue through
LCS ≥ δ, survivors re-ranked by BM25."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series
from nil_spark.operators.search_verify import verify_topk
from nil_spark.testing.oracle import lcs_similarity, overlap_similarity

CFG = EngineConfig(gram_size=3, min_chars=0, min_tokens=0)
DELTA = 60

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta epsilon zeta eta iota"),      # near-dup of 0
    (2, "theta eta zeta epsilon delta gamma beta alpha"),     # reversed: shingles
                                                              # differ, LCS = 1 token
    (3, "alpha beta gamma XX epsilon zeta eta XX kappa"),     # every 4th token swapped:
                                                              # low shingle overlap, high LCS
    (4, "totally different words here nothing shared at all"),
    (5, ""),                                                  # empty text
    (6, "alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta"),
]
QUERIES = [
    (100, "alpha beta gamma delta epsilon zeta eta theta", 3),
    (101, "nothing shared", 2),
    (102, "", 2),                                             # empty query
]
# retrieval is not under test here: hand the verifier a fixed
# candidate relation (every query x every doc) with synthetic BM25
CANDS = [
    (qid, did, round(10.0 - did * 0.5, 6)) for qid, _, _ in QUERIES for did, _ in DOCS
]


def _oracle(mode: str, delta: int = DELTA) -> pd.DataFrame:
    vcfg = CFG.with_(distinct_ngrams=True)
    toks = {i: tokenize_series(pd.Series([t]), vcfg)[0] for i, t in DOCS}
    qtoks = {i: tokenize_series(pd.Series([t]), vcfg)[0] for i, t, _ in QUERIES}
    sh = {i: set(terms_for_tokens(t, vcfg).tolist()) for i, t in toks.items()}
    qsh = {i: set(terms_for_tokens(t, vcfg).tolist()) for i, t in qtoks.items()}
    from nil_spark.functions.tokenize import _hash_token

    rows = []
    for qid, did, bm25 in CANDS:
        sim = overlap_similarity(qsh[qid], sh[did])
        tier = "ngram"
        ok = sim >= delta and mode != "always_lcs"
        if not ok and mode in ("two_tier", "always_lcs"):
            lcs = lcs_similarity(
                [_hash_token(t) for t in qtoks[qid]],
                [_hash_token(t) for t in toks[did]],
            )
            if lcs >= delta:
                sim, tier, ok = lcs, "lcs", True
        if ok:
            rows.append((qid, did, bm25, sim, tier))
    out = pd.DataFrame(rows, columns=["query_id", "doc_id", "bm25", "sim", "tier"])
    if out.empty:
        return out.assign(rank=pd.Series(dtype=int))
    out = out.sort_values(
        ["query_id", "bm25", "doc_id"], ascending=[True, False, True]
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    kmap = {qid: k for qid, _, k in QUERIES}
    return out[out["rank"] <= out["query_id"].map(kmap)].reset_index(drop=True)


def _engine(spark, mode: str, delta: int = DELTA) -> pd.DataFrame:
    cand = spark.createDataFrame(CANDS, "query_id long, doc_id long, bm25 double")
    queries = spark.createDataFrame(QUERIES, "query_id long, text string, k int")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return (
        verify_topk(cand, queries, docs, CFG, mode=mode, delta=delta)
        .orderBy("query_id", "rank")
        .toPandas()
    )


@pytest.mark.parametrize("mode", ["overlap", "two_tier", "always_lcs"])
def test_verify_matches_oracle(spark, mode):
    got = _engine(spark, mode)
    exp = _oracle(mode)
    assert len(got) == len(exp), f"{mode}: {len(got)} vs {len(exp)} rows"
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    e = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    for c in ["query_id", "rank", "doc_id", "sim", "tier"]:
        assert g[c].astype(str).tolist() == e[c].astype(str).tolist(), (
            f"{mode} col {c}:\n{g}\n---\n{e}"
        )
    assert (abs(g["bm25"] - e["bm25"]) < 1e-9).all()


def test_lcs_tier_rescues_shuffled_shingles(spark):
    """Doc 3 (every 4th token swapped) has low 3-gram shingle overlap
    with query 100 but high token LCS — it must be REJECTED by
    overlap-only and ACCEPTED by the LCS tier of two_tier."""
    overlap = _engine(spark, "overlap")
    two = _engine(spark, "two_tier")
    o_docs = set(overlap[overlap.query_id == 100]["doc_id"])
    t = two[two.query_id == 100]
    assert 3 not in o_docs
    trow = t[t.doc_id == 3]
    assert len(trow) == 1 and trow["tier"].iloc[0] == "lcs"
    # tier-1 accepts stay labeled ngram
    assert (t[t.doc_id.isin([0, 1])]["tier"] == "ngram").all()


def test_empty_query_and_doc_never_verify(spark):
    got = _engine(spark, "two_tier")
    assert not (got["query_id"] == 102).any()  # empty query: nothing verifies
    assert not (got["doc_id"] == 5).any()      # empty doc never accepted


def test_k_respected_per_query(spark):
    got = _engine(spark, "two_tier", delta=0)
    per = got.groupby("query_id")["rank"].max().to_dict()
    for qid, _, k in QUERIES:
        if qid in per:
            assert per[qid] <= k
