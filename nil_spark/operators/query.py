"""BM25 top-k query execution (DataFrame path).

Reference analog: candidate location by posting-list intersection
counting (/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/usecase/
cloneDetection/NGramBasedLocation.kt:10-15 — ``flatMap{index[it]}.
groupingBy{it}.eachCount()``) generalized from set-overlap counting to
BM25 scoring, and the per-query fan-out (CloneDetection.kt:7-9,
NILMain.kt:107-110) turned into ONE join of a query batch against the
postings relation — one Spark job per batch, not per query.

Scale shape: ``postings ⋈ broadcast(query_terms)`` — the query batch
(and its per-term idf) is always the small side, so the 100 TB postings
relation is never shuffled at query time; the only exchange is the
(query_id, doc_id) partial-aggregated score combine, whose key space is
bounded by (batch size × candidate docs).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import with_terms

# scores are rounded before ranking so float summation-order noise can
# never flip a rank between the engine, the oracle, and re-runs; ties
# break by ascending doc_id (SURVEY.md §2.8 rank-identity discipline).
SCORE_DECIMALS = 8


def idf_col(df_: Column, n_docs: int) -> Column:
    """Pinned BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — Lucene form,
    always positive."""
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_ + 0.5) / (df_ + 0.5))


def idf_py(df_: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))


def tf_norm_col(tf: Column, dl: Column, avgdl: float, cfg: EngineConfig) -> Column:
    """Pinned BM25 tf normalization: tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))."""
    k1, b = cfg.bm25_k1, cfg.bm25_b
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / F.lit(float(avgdl))))


def query_terms(queries: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(query_id, k, term, idf-ready) — distinct query terms (pinned:
    query-side tf collapsed to 1, mirroring the reference's distinct
    n-grams, entity/TokenSequence.kt:11).

    The min-size scan predicates (T4/T5) apply to *indexed docs* only
    (AntlrTransformer.kt:41-47 filters blocks at preprocess time) —
    a short query is still a valid query, so they are disabled here."""
    qt = with_terms(queries, cfg.with_(min_chars=1, min_tokens=1), text_col="text")
    return (
        qt.select("query_id", "k", F.explode("terms").alias("term"))
        .dropDuplicates(["query_id", "term"])
    )


def bm25_topk(
    queries: DataFrame,
    index: dict,
    cfg: EngineConfig,
) -> DataFrame:
    """Top-k (query_id, rank, doc_id, bm25) for a query batch.

    Plan: broadcast(query terms ⋈ term idf) ⋈ postings → per-row partial
    score (JVM-side expression, whole-stage codegen) → groupBy(query_id,
    doc_id) sum (map-side combine) → per-query window rank, k-bounded.
    """
    n_docs, avgdl = index["n_docs"], index["avgdl"]
    qterms = query_terms(queries, cfg)
    qterms = qterms.join(index["termdict"].select("term", "df"), "term", "inner")
    qterms = qterms.select(
        "term", "query_id", "k", idf_col(F.col("df"), n_docs).alias("idf")
    )

    scored = (
        index["postings"]
        .join(F.broadcast(qterms), "term", "inner")
        .select(
            "query_id",
            "k",
            "doc_id",
            (F.col("idf") * tf_norm_col(F.col("tf"), F.col("dl"), avgdl, cfg)).alias(
                "partial"
            ),
        )
        .groupBy("query_id", "k", "doc_id")
        .agg(F.round(F.sum("partial"), SCORE_DECIMALS).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "bm25")
    )
