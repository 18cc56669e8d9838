"""Engine-native cursor pagination (search_after) on the
replica-resident kernel: page N is selected by in-kernel admission on
the strictly-after (bm25 DESC, doc_id ASC) predicate, so paging k-by-k
through a ranking returns exactly the rows of one big-k run — including
across equal-score ties — and every page costs one k-sized top-k (no
offset re-rank).

Mirrors Elasticsearch ``search_after`` semantics over the same rounded
score space the kernel already pins for rank identity."""

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
    topk_replica_resident,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA

CFG = EngineConfig(gram_size=1)

FULL_K = 12
PAGE = 4  # three pages cover the full run


@pytest.fixture(scope="module")
def replica_index(spark, transcripts_1k, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sa_shards") / "shards")
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


def _run(spark, replica_index, qpdf, tokenize_on="driver"):
    paths, td_pdf, n_docs, avgdl = replica_index
    return (
        topk_replica_resident(
            spark, qpdf, paths, td_pdf, n_docs, avgdl, CFG,
            tokenize_on=tokenize_on,
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("tokenize_on", ["driver", "worker"])
def test_paged_equals_full_run(spark, transcripts_1k, queries_1k, replica_index, tokenize_on):
    """Paging PAGE-by-PAGE with cursors reconstructs the full-K run
    exactly: same docs, same scores, same order."""
    full_q = queries_1k.assign(k=FULL_K)
    full = _run(spark, replica_index, full_q, tokenize_on)

    pages = []
    cursor = None  # query_id -> (after_score, after_doc)
    for page_no in range(FULL_K // PAGE):
        qp = queries_1k.assign(k=PAGE)
        if cursor is not None:
            qp = qp.merge(cursor, on="query_id", how="inner")
            if len(qp) == 0:
                break
        got = _run(spark, replica_index, qp, tokenize_on)
        pages.append(got.assign(page=page_no))
        # next cursor: this page's last row per query; queries that
        # returned fewer than PAGE rows are exhausted
        last = got.groupby("query_id").tail(1)
        sizes = got.groupby("query_id").size()
        alive = sizes[sizes == PAGE].index
        cursor = (
            last[last["query_id"].isin(alive)]
            .rename(columns={"bm25": "after_score", "doc_id": "after_doc"})
            [["query_id", "after_score", "after_doc"]]
        )
        if len(cursor) == 0:
            break

    paged = pd.concat(pages, ignore_index=True)
    paged = paged.sort_values(
        ["query_id", "page", "rank"], kind="mergesort"
    ).reset_index(drop=True)
    assert len(paged) == len(full), (len(paged), len(full))
    assert (paged["query_id"].values == full["query_id"].values).all()
    assert (paged["doc_id"].values == full["doc_id"].values).all(), (
        pd.concat(
            [paged[["query_id", "doc_id", "bm25"]],
             full[["query_id", "doc_id", "bm25"]]],
            axis=1,
        )[paged["doc_id"].values != full["doc_id"].values].head(20)
    )
    assert np.allclose(paged["bm25"].values, full["bm25"].values, atol=0)
    # within each page ranks restart at 1
    assert (paged.groupby(["query_id", "page"])["rank"].min() == 1).all()


def test_cursor_past_end_returns_empty(spark, queries_1k, replica_index):
    """A cursor at (or past) the last result yields zero rows, not an
    error — the exhausted-scroll contract."""
    full = _run(spark, replica_index, queries_1k.assign(k=10_000))
    last = full.groupby("query_id").tail(1)
    qp = queries_1k.assign(k=PAGE).merge(
        last.rename(columns={"bm25": "after_score", "doc_id": "after_doc"})[
            ["query_id", "after_score", "after_doc"]
        ],
        on="query_id",
    )
    got = _run(spark, replica_index, qp)
    assert len(got) == 0


def test_missing_cursor_columns_mean_page_one(spark, queries_1k, replica_index):
    """A batch without after_* columns (and one with the -1 sentinel)
    behaves exactly as before — page 1."""
    base = _run(spark, replica_index, queries_1k.assign(k=PAGE))
    with_sentinel = _run(
        spark,
        replica_index,
        queries_1k.assign(k=PAGE, after_score=float("nan"), after_doc=-1),
    )
    assert (base["doc_id"].values == with_sentinel["doc_id"].values).all()
    assert np.allclose(base["bm25"].values, with_sentinel["bm25"].values, atol=0)
