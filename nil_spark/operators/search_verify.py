"""Filter-then-verify SEARCH serving: a verification pass over BM25
top-k candidates, mirroring the reference's two-tier clone pipeline
(OptimizedCloneDetection.kt:17-56) applied to the *query* path: any
retrieval topology (join / replica / block-max WAND / sharded) returns
``k + margin`` candidates per query; a cheap tier-1 n-gram-overlap
verification accepts the obvious hits JVM-side; only the residue pays
the Hunt-Szymanski LCS kernel (LCSBasedVerification.kt:8-18); verified
candidates re-rank by BM25 and the top ``k`` survive.

Scale shape (100 TB): the candidate set is ``n_queries x (k+margin)``
rows — always the small side — so every join against the corpus
broadcasts the candidate/query side and the corpus itself never
shuffles: doc shingle arrays are computed only for the semi-joined
candidate docs, tier-1 overlap is a pure JVM ``array_intersect``
column expression inside whole-stage codegen, and the Python LCS
kernel sees only the tier-1 residue (Arrow mapInPandas, never
row-at-a-time).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nil_spark.config import EngineConfig
from nil_spark.functions.lcs import lcs_similarity_int
from nil_spark.functions.tokenize import _hash_token, tokenize_series, with_terms

VERIFY_MODES = ("overlap", "two_tier", "always_lcs")


def _overlap_sim(qcol: str, dcol: str):
    """floor(100·|q∩d| / min(|q|,|d|)) over distinct-shingle arrays —
    the reference's verification similarity (NGramBasedFiltration.kt:
    6-12 formula, applied at the verify threshold δ) as a codegen'd
    column expression.  Empty either side → 0 (nothing to verify)."""
    inter = F.size(F.array_intersect(F.col(qcol), F.col(dcol)))
    lo = F.least(F.size(qcol), F.size(dcol))
    return F.when(lo > 0, F.floor(inter * 100 / lo).cast("int")).otherwise(
        F.lit(0)
    )


def _lcs_verify_kernel(cfg: EngineConfig):
    """Arrow kernel: (query_id, doc_id, bm25, qtext, text) →
    + lcs_sim.  Token hashes are memoized per batch; LCS is the
    Hunt-Szymanski O((r+n)log n) engine kernel."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            tq = tokenize_series(pdf["qtext"], cfg)
            td = tokenize_series(pdf["text"], cfg)
            sims = np.empty(len(pdf), dtype=np.int32)
            memo: dict[str, int] = {}

            def h(tok: str) -> int:
                v = memo.get(tok)
                if v is None:
                    v = _hash_token(tok)
                    memo[tok] = v
                return v

            for i, (x, y) in enumerate(zip(tq, td)):
                sims[i] = lcs_similarity_int([h(t) for t in x], [h(t) for t in y])
            out = pdf[["query_id", "doc_id", "bm25"]].copy()
            out["lcs_sim"] = sims
            yield out

    return run


def verify_topk(
    candidates: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    cfg: EngineConfig,
    mode: str = "two_tier",
    delta: int | None = None,
) -> DataFrame:
    """Verification pass over retrieved candidates →
    ``(query_id, rank, doc_id, bm25, sim, tier)``.

    ``candidates``: ``(query_id, doc_id, bm25)`` — the top ``k+margin``
    rows per query from any serving topology.
    ``queries``: ``(query_id, text, k)``; ``docs``: ``(doc_id, text)``.

    ``mode``:
      * ``"overlap"`` — tier-1 only: accept iff distinct-shingle
        overlap ≥ δ (SQL-expressible; the driver-gate oracle tier);
      * ``"two_tier"`` (default) — tier-1 fast-accept, residue through
        the LCS kernel (the reference's OptimizedCloneDetection
        staging); accepted residue carries ``tier='lcs'`` and ``sim``
        = the LCS similarity;
      * ``"always_lcs"`` — every candidate pays LCS (reference
        NormalCloneDetection.kt:16-45 analog).

    δ defaults to ``cfg.verification_threshold`` (reference ``-v 70``).
    Verification tokenizes with the min-size predicates DISABLED —
    they are *scan* predicates (the index never held tiny docs), not
    verify predicates, and a short query must not verify against
    nothing.
    """
    if mode not in VERIFY_MODES:
        raise ValueError(f"mode must be one of {VERIFY_MODES}, got {mode!r}")
    delta = int(cfg.verification_threshold if delta is None else delta)
    vcfg = cfg.with_(distinct_ngrams=True, min_chars=0, min_tokens=0)

    cand = candidates.select("query_id", "doc_id", "bm25")
    qk = queries.select("query_id", F.col("k").cast("int").alias("k"))
    qterms = with_terms(queries, vcfg).select(
        "query_id", F.col("terms").alias("qterms")
    )
    # corpus side: shingle arrays for CANDIDATE docs only — semi-join
    # on the broadcast candidate-id set keeps the scan a single
    # filtered pass, no corpus shuffle
    cids = cand.select("doc_id").distinct()
    cdocs = docs.join(F.broadcast(cids), "doc_id")
    dterms = with_terms(cdocs, vcfg).select(
        "doc_id", F.col("terms").alias("dterms")
    )

    # dterms carries the wide shingle arrays — stream it and broadcast
    # the NARROW relations (cand is 3 scalar columns, qterms is
    # query-batch-sized), so the verify stage is exchange-free: the
    # only shuffles in a verified query job belong to retrieval and
    # the final per-query rank window
    scored = (
        dterms.join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(qterms), "query_id")
        .withColumn("sim", _overlap_sim("qterms", "dterms"))
        .select("query_id", "doc_id", "bm25", "sim")
    )

    if mode == "always_lcs":
        accepted = scored.filter(F.lit(False)).withColumn("tier", F.lit("ngram"))
        residue = scored
    else:
        accepted = scored.filter(F.col("sim") >= delta).withColumn(
            "tier", F.lit("ngram")
        )
        residue = (
            scored.filter(F.col("sim") < delta)
            if mode == "two_tier"
            else None
        )

    if mode != "overlap":
        qtext = queries.select("query_id", F.col("text").alias("qtext"))
        rtext = (
            residue.select("query_id", "doc_id", "bm25")
            .join(F.broadcast(qtext), "query_id")
            .join(docs.join(F.broadcast(cids), "doc_id"), "doc_id")
            .select("query_id", "doc_id", "bm25", "qtext", "text")
        )
        lcs = rtext.mapInPandas(
            _lcs_verify_kernel(vcfg),
            schema="query_id long, doc_id long, bm25 double, lcs_sim int",
        )
        accepted = accepted.unionByName(
            lcs.filter(F.col("lcs_sim") >= delta)
            .select(
                "query_id",
                "doc_id",
                "bm25",
                F.col("lcs_sim").alias("sim"),
                F.lit("lcs").alias("tier"),
            )
        )

    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        accepted.join(F.broadcast(qk), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "bm25", "sim", "tier")
    )
