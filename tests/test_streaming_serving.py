"""Streaming query serving: micro-batch answers must equal the batch
serving path on the same queries, the sink must be idempotent on
batch_id, and the stream checkpoint must skip answered files."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    build_partial_segments,
    topk_replica_resident,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_queries
from nil_spark.streaming.serving import StreamingQueryServer

CFG = EngineConfig(gram_size=1, num_segments=4, block_size=16)


@pytest.fixture(scope="module")
def index(spark, transcripts_1k, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve_shards") / "shards")
    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    build_partial_segments(docs.repartition(4), CFG).write.parquet(d)
    raw = spark.read.parquet(d)
    st = (
        raw.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s"))
        .collect()[0]
    )
    n_docs = int(st["n"])
    avgdl = float(st["s"]) / n_docs
    termdict = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
    ).toPandas()
    paths = sorted(glob.glob(d + "/part-*.parquet"))
    return paths, termdict, n_docs, avgdl


@pytest.fixture()
def query_dir(transcripts_1k, tmp_path):
    qpdf = gen_queries(transcripts_1k, n_queries=12, k=5, seed=11)
    d = tmp_path / "qstream"
    d.mkdir()
    # two files -> two deterministic micro-batches (maxFilesPerTrigger=1)
    for i, chunk in enumerate((qpdf.iloc[:6], qpdf.iloc[6:])):
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            str(d / f"queries-{i}.parquet"),
        )
    return str(d), qpdf


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf[["query_id", "rank", "doc_id", "bm25"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_stream_matches_batch_serving(spark, index, query_dir, tmp_path):
    paths, termdict, n_docs, avgdl = index
    qdir, qpdf = query_dir
    srv = StreamingQueryServer(
        str(tmp_path / "out"), paths, termdict, n_docs, avgdl, CFG
    )
    srv.run_available(spark, qdir)

    got = _canon(srv.results(spark).toPandas())
    exp = _canon(
        topk_replica_resident(
            spark, qpdf, paths, termdict, n_docs, avgdl, CFG
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, exp)
    assert len(srv.manifest["batches"]) == 2
    assert sorted(b["n_queries"] for b in srv.manifest["batches"]) == [6, 6]


def test_redelivery_idempotent(spark, index, query_dir, tmp_path):
    paths, termdict, n_docs, avgdl = index
    qdir, qpdf = query_dir
    srv = StreamingQueryServer(
        str(tmp_path / "out2"), paths, termdict, n_docs, avgdl, CFG
    )
    batch = spark.createDataFrame(qpdf.iloc[:6], "query_id long, text string, k int")
    srv.answer_batch(batch, 0)
    n1 = srv.results(spark).count()
    srv.answer_batch(batch, 0)  # redelivery: must be a no-op
    assert srv.results(spark).count() == n1
    assert len(srv.manifest["batches"]) == 1


def test_checkpoint_skips_answered_files(spark, index, query_dir, tmp_path):
    paths, termdict, n_docs, avgdl = index
    qdir, _ = query_dir
    out = str(tmp_path / "out3")
    srv = StreamingQueryServer(out, paths, termdict, n_docs, avgdl, CFG)
    srv.run_available(spark, qdir)
    walls = [b["wall_s"] for b in srv.manifest["batches"]]
    # second drain over the same directory: checkpoint skips everything
    srv2 = StreamingQueryServer(out, paths, termdict, n_docs, avgdl, CFG)
    srv2.run_available(spark, qdir)
    assert [b["wall_s"] for b in srv2.manifest["batches"]] == walls
    commits = [
        f
        for f in os.listdir(os.path.join(out, "_stream_checkpoint", "commits"))
        if not f.startswith(".")
    ]
    assert len(commits) == 2
