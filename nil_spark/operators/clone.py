"""Two-tier filter-then-verify clone detection over a doc table.

The reference's primary pipeline (SURVEY.md §2.4, §3.1): candidate
location by posting intersection (NGramBasedLocation.kt:10-16) →
cheap overlap filtration θ (NGramBasedFiltration.kt:6-12) → tier-1
n-gram verification δ with short-circuit (OptimizedCloneDetection.kt:
22-35) → tier-2 Hunt-Szymanski LCS verification on the residue
(LCSBasedVerification.kt:8-18, OptimizedCloneDetection.kt:36-53).

Spark shape:
 * location = self-join of the distinct-term postings relation with the
   triangular guard id1 < id2 — Catalyst plans a shuffled hash join on
   ``term``; df-based stopword pruning (index.py) bounds the per-term
   fan-out exactly like the reference's distinct-n-gram set semantics;
 * filtration + tier-1 are pure column expressions (codegen'd) so the
   expensive Python LCS UDF only ever sees the small residue;
 * tier-2 re-joins the residue with doc text and runs an Arrow-batched
   mapInPandas — per batch, tokens are hashed once through a memo cache
   and LCS runs per pair.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.lcs import lcs_similarity_int
from nil_spark.functions.tokenize import tokenize_series, _hash_token, with_terms


def candidate_pairs(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(id1, id2, inter, n1, n2, sim) — location + filtration.

    ``docs`` must carry ``doc_id`` and ``text``.  Terms are distinct
    n-gram shingles (set semantics, entity/TokenSequence.kt:11).
    """
    cfg = cfg.with_(distinct_ngrams=True)
    dt = with_terms(docs, cfg).select("doc_id", "terms").persist()
    g = dt.select("doc_id", F.explode("terms").alias("term")).persist()  # self-joined
    sizes = dt.select("doc_id", F.size("terms").alias("nsh")).filter(F.col("nsh") > 0)

    # df-based pruning bounds the join fan-out on hot terms
    if cfg.df_stopword_cutoff is not None and cfg.df_stopword_cutoff < 1.0:
        n_docs = sizes.count()
        hot = (
            g.groupBy("term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > int(cfg.df_stopword_cutoff * n_docs))
            .select("term")
        )
        g = g.join(F.broadcast(hot), "term", "left_anti")

    a, b = g.alias("a"), g.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("nsh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("nsh").alias("n2"))
    cand = (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "sim", F.floor(F.col("inter") * 100 / F.least("n1", "n2")).cast("int")
        )
        .filter(F.col("sim") >= cfg.filtration_threshold)
    )
    return cand.select("id1", "id2", "inter", "n1", "n2", "sim")


def _lcs_udf_factory(cfg: EngineConfig):
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            t1 = tokenize_series(pdf["text1"], cfg)
            t2 = tokenize_series(pdf["text2"], cfg)
            sims = np.empty(len(pdf), dtype=np.int32)
            for i, (x, y) in enumerate(zip(t1, t2)):
                hx = [_hash_token(t) for t in x]
                hy = [_hash_token(t) for t in y]
                sims[i] = lcs_similarity_int(hx, hy)
            out = pdf[["id1", "id2", "sim"]].copy()
            out["lcs_sim"] = sims
            yield out

    return run


def clone_detect(
    docs: DataFrame,
    cfg: EngineConfig,
    mode: str = "two_tier",
    verify_cap: int | None = None,
) -> DataFrame:
    """Clone pipeline → (id1, id2, ngram_sim, lcs_sim nullable).

    ``mode="two_tier"`` (default): tier-1 n-gram fast-accept with null
    ``lcs_sim`` (nullable ``lcsSimilarity`` of ClonePairResult.kt:10-15,
    OptimizedCloneDetection.kt:17-56); ``mode="always_lcs"``: every
    candidate goes through LCS — the reference's single-tier variant
    (NormalCloneDetection.kt:16-45, present but unwired in NILMain).

    ``verify_cap`` bounds the filtration residue entering the Python
    LCS verify stage to the ``verify_cap`` highest-``sim`` pairs
    (deterministic (sim desc, id1, id2) order) — a cost-control /
    benchmarking knob making the verify stage's input size explicit;
    the capped variant trades recall on the lowest-overlap residue for
    a hard ceiling on Python compute.  None (default) = verify all.
    """
    cand = candidate_pairs(docs, cfg)
    if mode == "always_lcs":
        tier1 = cand.filter(F.lit(False)).select(
            "id1", "id2",
            F.col("sim").alias("ngram_sim"),
            F.lit(None).cast("int").alias("lcs_sim"),
        )
        residue = cand
    else:
        tier1 = (
            cand.filter(F.col("sim") >= cfg.verification_threshold)
            .select(
                "id1",
                "id2",
                F.col("sim").alias("ngram_sim"),
                F.lit(None).cast("int").alias("lcs_sim"),
            )
        )
        residue = cand.filter(F.col("sim") < cfg.verification_threshold)
    if verify_cap is not None:
        # highest-overlap pairs are the likeliest true clones — keep
        # those.  orderBy+limit gathers only (id1, id2, sim) triples
        # (bytes per pair), never text, so the cap itself is cheap.
        residue = residue.orderBy(
            F.col("sim").desc(), "id1", "id2"
        ).limit(int(verify_cap))

    text = docs.select("doc_id", "text")
    joined = (
        residue.join(
            text.select(F.col("doc_id").alias("id1"), F.col("text").alias("text1")),
            "id1",
        )
        .join(
            text.select(F.col("doc_id").alias("id2"), F.col("text").alias("text2")),
            "id2",
        )
        .select("id1", "id2", "sim", "text1", "text2")
    )
    verified = joined.mapInPandas(
        _lcs_udf_factory(cfg), schema="id1 long, id2 long, sim int, lcs_sim int"
    )
    tier2 = verified.filter(
        F.col("lcs_sim") >= cfg.verification_threshold
    ).select("id1", "id2", F.col("sim").alias("ngram_sim"), "lcs_sim")
    return tier1.unionByName(tier2)
