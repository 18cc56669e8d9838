"""Iceberg as a streaming SOURCE (PySpark 4 Python DataSource API):
incremental append scans planned from manifests, Arrow-batched
partition reads, compaction-safe offsets."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nil_spark.sources.iceberg import IcebergTable, write_iceberg
from nil_spark.sources.iceberg_stream import IcebergStreamSource
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture()
def transcripts_df(spark, transcripts_1k):
    return spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)


def _key_set(df):
    return {(r.conv_id, r.turn_idx) for r in df.select("conv_id", "turn_idx").collect()}


def test_incremental_scan_batch_api(spark, transcripts_df, tmp_path):
    p = str(tmp_path / "tbl")
    a = transcripts_df.filter("turn_idx < 2")
    b = transcripts_df.filter("turn_idx >= 2")
    t = write_iceberg(spark, a, p)  # seq 1
    t.append(spark, b)  # seq 2
    assert _key_set(t.incremental_scan(spark, 0, 1)) == _key_set(a)
    assert _key_set(t.incremental_scan(spark, 1, 2)) == _key_set(b)
    assert _key_set(t.incremental_scan(spark, 0)) == _key_set(transcripts_df)
    assert t.incremental_scan(spark, 2, 2).count() == 0
    # a delete advances the sequence but adds no incremental rows
    t.delete_where(spark, F.col("role") == "tool")  # seq 3
    assert t.incremental_scan(spark, 2).count() == 0
    # compaction rewrites everything; its files must NOT re-emit
    t.rewrite_data_files(spark, target_files=1)  # seq 4
    assert t.incremental_scan(spark, 3).count() == 0
    # an append after compaction is fresh data again
    extra = transcripts_df.limit(5)
    t.append(spark, extra)  # seq 5
    assert _key_set(t.incremental_scan(spark, 4)) == _key_set(extra)


def test_stream_source_end_to_end(spark, transcripts_df, tmp_path):
    """readStream.format('nil_iceberg'): existing rows arrive in the
    first batch, appends stream through, compaction does not duplicate,
    and the output schema matches the table schema."""
    spark.dataSource.register(IcebergStreamSource)
    p = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    a = transcripts_df.filter("turn_idx = 0")
    b = transcripts_df.filter("turn_idx = 1")
    c = transcripts_df.filter("turn_idx = 2")
    t = write_iceberg(spark, a, p)

    stream = spark.readStream.format("nil_iceberg").option("path", p).load()
    assert stream.schema == transcripts_df.schema
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(out)
        assert _key_set(got) == _key_set(a)
        # append -> next batch picks up exactly the new rows
        t.append(spark, b)
        q.processAllAvailable()
        got = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(out)
        assert _key_set(got) == _key_set(a.union(b))
        # compaction between batches: offset advances, nothing re-emits
        t.rewrite_data_files(spark, target_files=1)
        q.processAllAvailable()
        assert spark.read.schema(TRANSCRIPT_SCHEMA).parquet(out).count() == a.count() + b.count()
        t.append(spark, c)
        q.processAllAvailable()
        got = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(out)
        assert _key_set(got) == _key_set(a.union(b).union(c))
        assert got.count() == a.count() + b.count() + c.count()  # no dupes
    finally:
        q.stop()
    # row-level parity on a sample column, not just keys
    want = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in transcripts_df.filter("turn_idx <= 2").collect()
    )
    got_rows = sorted((r.conv_id, r.turn_idx, r.text) for r in got.collect())
    assert got_rows == want


def test_iceberg_stream_feeds_incremental_index(spark, transcripts_1k, tmp_path):
    """The full loop the north rule describes: transcripts land in an
    Iceberg table snapshot by snapshot; the incremental index streams
    OUT of the table (nil_iceberg source → foreachBatch absorb) and is
    rank-identical to a batch build over the same corpus."""
    import numpy as np

    from nil_spark.config import EngineConfig
    from nil_spark.operators.docids import assign_doc_ids
    from nil_spark.operators.index import build_index
    from nil_spark.operators.query import bm25_topk
    from nil_spark.operators.segments import topk_maxscore
    from nil_spark.sources.transcripts import gen_queries
    from nil_spark.streaming.incremental import IncrementalIndexer

    cfg = EngineConfig(gram_size=1, num_segments=4, block_size=16)
    spark.dataSource.register(IcebergStreamSource)
    p = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    index_dir = str(tmp_path / "idx")

    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    half = len(ordered) // 2
    ix = IncrementalIndexer(index_dir, cfg)

    def drain():
        q = (
            spark.readStream.format("nil_iceberg")
            .option("path", p)
            .load()
            .writeStream.foreachBatch(ix.absorb_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = write_iceberg(
        spark,
        spark.createDataFrame(ordered.iloc[:half], schema=TRANSCRIPT_SCHEMA),
        p,
    )
    drain()
    t.append(spark, spark.createDataFrame(ordered.iloc[half:], schema=TRANSCRIPT_SCHEMA))
    drain()

    idx_s = ix.load_index(spark)
    assert idx_s["n_docs"] == len(ordered)
    q = spark.createDataFrame(
        gen_queries(ordered, n_queries=10, k=5, seed=17),
        schema="query_id long, text string, k int",
    )
    got = (
        topk_maxscore(q, idx_s["segments"], idx_s["termdict"], idx_s["n_docs"], idx_s["avgdl"], cfg)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    docs = assign_doc_ids(
        spark.createDataFrame(ordered, schema=TRANSCRIPT_SCHEMA), ["conv_id", "turn_idx"]
    )
    exp = (
        bm25_topk(q, build_index(docs, cfg), cfg)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-9)


def test_stream_source_partitioned_table(spark, transcripts_df, tmp_path):
    """Identity-partition columns are re-attached from manifest
    partition values (the data files do not carry them)."""
    spark.dataSource.register(IcebergStreamSource)
    p = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    write_iceberg(spark, transcripts_df, p, partition_by=["role"])
    q = (
        spark.readStream.format("nil_iceberg")
        .option("path", p)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(out)
    assert got.count() == 1000
    roles = {r.role for r in got.select("role").distinct().collect()}
    assert roles == {"user", "assistant", "tool"}
    # full column order + types preserved
    assert got.schema == transcripts_df.schema
