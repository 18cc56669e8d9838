"""Engine-native score explanation: ``explain_topk_replica`` reads the
per-term (idf, contribution) breakdown for each top hit straight from
the replica posting arrays.  Pinned three ways: exact row match against
the pure-Python oracle's breakdown, sum-to-total against the serving
kernel's bm25, and in-kernel tombstone exclusion against the oracle's
excluded-docs breakdown."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    build_partial_segments,
    explain_topk_replica,
    topk_replica_resident,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.testing.oracle import OracleIndex

CFG = EngineConfig(gram_size=1)
K = 7


@pytest.fixture(scope="module")
def replica_index(spark, transcripts_1k, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ex_shards") / "shards")
    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    build_partial_segments(docs.repartition(5), CFG).write.parquet(d)
    raw = spark.read.parquet(d)
    sent = raw.filter(F.col("term") == DOCSTAT_SENTINEL)
    st = sent.agg(
        F.sum("n_postings").alias("n"),
        F.sum(F.element_at("bm_max", 1)).alias("s"),
    ).collect()[0]
    n_docs, avgdl = int(st["n"]), float(st["s"]) / int(st["n"])
    termdict = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
    )
    if CFG.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(
            F.col("df") <= int(CFG.df_stopword_cutoff * n_docs)
        )
    paths = sorted(glob.glob(d + "/part-*.parquet"))
    return paths, termdict.toPandas(), n_docs, avgdl


def _oracle_frame(oracle, queries, excluded=None):
    rows = []
    for _, q in queries.iterrows():
        for rank, did, term, idf, contrib, bm25 in oracle.explain_parts(
            q["text"], K, excluded=excluded
        ):
            rows.append((int(q["query_id"]), rank, did, term, idf, contrib, bm25))
    return pd.DataFrame(
        rows,
        columns=["query_id", "rank", "doc_id", "term", "idf", "contrib", "bm25"],
    )


KEYS = ["query_id", "rank", "doc_id", "term"]


def _assert_rows_match(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.sort_values(KEYS).reset_index(drop=True)
    exp = exp.sort_values(KEYS).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in KEYS:
        assert (got[c].values == exp[c].values).all(), c
    for c in ("idf", "contrib", "bm25"):
        assert np.allclose(got[c].values, exp[c].values, atol=1e-9), c


def test_explain_matches_oracle_breakdown(
    spark, transcripts_1k, queries_1k, replica_index
):
    paths, td_pdf, n_docs, avgdl = replica_index
    qp = queries_1k.assign(k=K)
    got = explain_topk_replica(
        spark, qp, paths, td_pdf, n_docs, avgdl, CFG
    ).toPandas()
    oracle = OracleIndex(transcripts_1k, CFG)
    exp = _oracle_frame(oracle, queries_1k)
    _assert_rows_match(got, exp)


def test_explain_sums_to_serving_kernel(spark, queries_1k, replica_index):
    """grouped sum(contrib) must round to the EXACT bm25 the serving
    kernel returns, and the (query, rank, doc) sets must be identical —
    an explanation that disagrees with the ranking it explains is
    worse than none."""
    paths, td_pdf, n_docs, avgdl = replica_index
    qp = queries_1k.assign(k=K)
    served = (
        topk_replica_resident(spark, qp, paths, td_pdf, n_docs, avgdl, CFG)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = explain_topk_replica(
        spark, qp, paths, td_pdf, n_docs, avgdl, CFG
    ).toPandas()
    agg = (
        got.groupby(["query_id", "rank", "doc_id"], as_index=False)
        .agg(total=("contrib", "sum"), bm25=("bm25", "first"))
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert (agg["query_id"].values == served["query_id"].values).all()
    assert (agg["rank"].values == served["rank"].values).all()
    assert (agg["doc_id"].values == served["doc_id"].values).all()
    assert np.allclose(agg["bm25"].values, served["bm25"].values, atol=0)
    # contribs are individually rounded, so the sum of R rows can drift
    # up to R * 0.5e-6 from the rounded total
    r_max = got.groupby(["query_id", "doc_id"]).size().max()
    assert np.allclose(
        agg["total"].values, agg["bm25"].values, atol=r_max * 5e-7 + 1e-9
    )


def test_explain_respects_tombstones(
    spark, transcripts_1k, queries_1k, replica_index
):
    """In-kernel exclusion: tombstoned docs vanish from the explained
    ranking and the survivors match the oracle's excluded-docs
    breakdown exactly."""
    paths, td_pdf, n_docs, avgdl = replica_index
    qp = queries_1k.assign(k=K)
    base = explain_topk_replica(
        spark, qp, paths, td_pdf, n_docs, avgdl, CFG
    ).toPandas()
    # tombstone the two most frequent winners
    dead = (
        base.groupby("doc_id").size().sort_values(ascending=False).index[:2]
    )
    dead_arr = np.array(sorted(int(d) for d in dead), dtype=np.int64)
    got = explain_topk_replica(
        spark, qp, paths, td_pdf, n_docs, avgdl, CFG, excluded=dead_arr
    ).toPandas()
    assert not set(got["doc_id"]) & set(dead_arr.tolist())
    oracle = OracleIndex(transcripts_1k, CFG)
    exp = _oracle_frame(oracle, queries_1k, excluded=set(dead_arr.tolist()))
    _assert_rows_match(got, exp)
