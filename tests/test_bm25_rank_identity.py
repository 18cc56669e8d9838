"""End-to-end slice: transcripts → doc ids → index → BM25 top-k must be
rank-identical (doc ids AND scores) to the pure-Python oracle.

Mirrors the reference's golden-test discipline
(/root/reference/src/test/kotlin/.../NILMainTest.kt:10-88): small
planted corpus, order-insensitive compare — except our goldens are
computed by the pinned-hash oracle rather than handwritten.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.index import build_index
from nil_spark.operators.query import bm25_topk
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.testing.oracle import OracleIndex

CFG = EngineConfig(gram_size=1)


def _spark_topk(spark, transcripts: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
    docs = spark.createDataFrame(transcripts, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=5)
    idx = build_index(docs, CFG)
    q = spark.createDataFrame(queries, schema="query_id long, text string, k int")
    return (
        bm25_topk(q, idx, CFG)
        .orderBy("query_id", "rank")
        .toPandas()
    )


def test_doc_ids_are_dense_and_stable(spark, transcripts_1k):
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    got = (
        assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=7)
        .select("conv_id", "turn_idx", "doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(range(len(transcripts_1k)))
    expect = transcripts_1k.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # per-turn text equality under stable turn ordering (the BASELINE
    # input_hint per-row invariant)
    assert (got["text"].values == expect["text"].values).all()
    assert (got["conv_id"].values == expect["conv_id"].values).all()
    assert (got["turn_idx"].values == expect["turn_idx"].values).all()


def test_bm25_rank_identity_unigram(spark, transcripts_1k, queries_1k):
    got = _spark_topk(spark, transcripts_1k, queries_1k)
    oracle = OracleIndex(transcripts_1k, CFG)
    exp = oracle.topk_frame(queries_1k)
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp), f"row count {len(got)} vs oracle {len(exp)}"
    assert (got["query_id"].values == exp["query_id"].values).all()
    assert (got["rank"].values == exp["rank"].values).all()
    assert (got["doc_id"].values == exp["doc_id"].values).all(), (
        pd.concat([got, exp], axis=1)[
            (got["doc_id"].values != exp["doc_id"].values)
        ].head(20)
    )
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-6)


def test_bm25_rank_identity_ngram5(spark, transcripts_1k, queries_1k):
    cfg = EngineConfig(gram_size=5, distinct_ngrams=True)
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=3)
    idx = build_index(docs, cfg)
    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = bm25_topk(q, idx, cfg).orderBy("query_id", "rank").toPandas()
    oracle = OracleIndex(transcripts_1k, cfg)
    exp = oracle.topk_frame(queries_1k)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-6)
