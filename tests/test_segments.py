"""Segment codec, block-max MaxScore query path, checkpoint/resume."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.config import EngineConfig
from nil_spark.functions import varint
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.index import build_index
from nil_spark.operators.query import bm25_topk
from nil_spark.operators.segments import (
    CheckpointedIndexBuilder,
    build_segments,
    decode_postings,
    topk_maxscore,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.testing.oracle import OracleIndex

CFG = EngineConfig(gram_size=1, num_segments=4, block_size=16)


@given(st.lists(st.integers(0, 2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint.decode(varint.encode(arr)) == arr).all()


@given(st.sets(st.integers(0, 2**40), max_size=100))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert (varint.decode_deltas(varint.encode_deltas(arr)) == arr).all()


@pytest.fixture(scope="module")
def indexed(spark, transcripts_1k):
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    idx = build_index(docs, CFG)
    segs = build_segments(idx["postings"], CFG, max_chunk=64)
    return docs, idx, segs.persist()


def test_segments_decode_exactly(indexed):
    _, idx, segs = indexed
    exp = (
        idx["postings"].toPandas().sort_values(["term", "doc_id"]).groupby("term")
    )
    got_rows = segs.toPandas().sort_values(["term", "first_doc"])
    got = {}
    for term, g in got_rows.groupby("term"):
        ds, tfs, dls = [], [], []
        for _, row in g.iterrows():
            d, t, dl = decode_postings(row)
            ds.append(d)
            tfs.append(t)
            dls.append(dl)
        got[term] = (
            np.concatenate(ds),
            np.concatenate(tfs),
            np.concatenate(dls),
        )
    n_terms = 0
    for term, g in exp:
        d, t, dl = got[term]
        assert (d == g["doc_id"].to_numpy()).all()
        assert (t == g["tf"].to_numpy()).all()
        assert (dl == g["dl"].to_numpy()).all()
        n_terms += 1
    assert n_terms == len(got)
    # chunking actually exercised (hot terms split at max_chunk=64)
    assert (got_rows["chunk_idx"] > 0).any()


def test_maxscore_rank_identical_to_dataframe_path(
    spark, indexed, transcripts_1k, queries_1k
):
    docs, idx, segs = indexed
    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    df_path = bm25_topk(q, idx, CFG).toPandas()
    seg_path = topk_maxscore(
        q, segs, idx["termdict"], idx["n_docs"], idx["avgdl"], CFG
    ).toPandas()
    df_path = df_path.sort_values(["query_id", "rank"]).reset_index(drop=True)
    seg_path = seg_path.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(df_path) == len(seg_path)
    assert (df_path["doc_id"].values == seg_path["doc_id"].values).all()
    assert np.allclose(df_path["bm25"].values, seg_path["bm25"].values, atol=1e-9)
    # and both match the pure-Python oracle
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (seg_path["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(seg_path["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_maxscore_longquery_rank_identical(spark, indexed, transcripts_1k):
    """Long (multi-doc concatenation) queries drive the three-way chunk
    classification — block-max bound skips, update-only decodes, and
    intersect-mode candidate pruning — which short queries never reach;
    results must stay rank- and score-identical to both the DataFrame
    path and the pure-Python oracle."""
    docs, idx, segs = indexed
    texts = transcripts_1k["text"].tolist()
    longq = pd.DataFrame(
        {
            "query_id": range(6),
            "text": [" ".join(texts[i * 8 : i * 8 + 8]) for i in range(6)],
            "k": 10,
        }
    )
    q = spark.createDataFrame(longq, schema="query_id long, text string, k int")
    df_path = bm25_topk(q, idx, CFG).toPandas()
    seg_path = topk_maxscore(
        q, segs, idx["termdict"], idx["n_docs"], idx["avgdl"], CFG
    ).toPandas()
    df_path = df_path.sort_values(["query_id", "rank"]).reset_index(drop=True)
    seg_path = seg_path.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(df_path) == len(seg_path) > 0
    assert (df_path["doc_id"].values == seg_path["doc_id"].values).all()
    assert np.allclose(df_path["bm25"].values, seg_path["bm25"].values, atol=1e-9)
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(longq)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (seg_path["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(seg_path["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_checkpoint_resume(spark, transcripts_1k, queries_1k, tmp_path):
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    path = str(tmp_path / "idx")

    # simulated failure: build then "crash" — wipe only the later stages
    b1 = CheckpointedIndexBuilder(path, CFG)
    b1.build(docs)
    man1 = json.load(open(os.path.join(path, "manifest.json")))
    import shutil

    shutil.rmtree(os.path.join(path, "segments"))
    man1["stages"].pop("segments")
    json.dump(man1, open(os.path.join(path, "manifest.json"), "w"))

    # resume: completed stages must be skipped (identical finished_at),
    # killed stage rebuilt
    b2 = CheckpointedIndexBuilder(path, CFG)
    idx2 = b2.build(docs)
    man2 = json.load(open(os.path.join(path, "manifest.json")))
    for stage in ("docstats", "postings", "termdict"):
        assert (
            man2["stages"][stage]["finished_at"]
            == man1["stages"][stage]["finished_at"]
        ), f"stage {stage} was rebuilt instead of resumed"
    assert "segments" in man2["stages"]
    # lineage: per-partition counts recorded
    assert all(
        "partitions" in s and s["rows"] == sum(p["rows"] for p in s["partitions"])
        for s in man2["stages"].values()
    )

    # resumed index answers queries identically to a fresh one
    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = (
        topk_maxscore(
            q, idx2["segments"], idx2["termdict"], idx2["n_docs"], idx2["avgdl"], CFG
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_checkpoint_resume_fused(spark, transcripts_1k, queries_1k, tmp_path):
    """The fused build path is checkpoint-resumable too: wipe the merge
    stage, resume, earlier stages skipped, results rank-identical."""
    import shutil

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    path = str(tmp_path / "fidx")

    b1 = CheckpointedIndexBuilder(path, CFG)
    b1.build_fused(docs.repartition(5))
    man1 = json.load(open(os.path.join(path, "manifest.json")))
    shutil.rmtree(os.path.join(path, "segments"))
    man1["stages"].pop("segments")
    json.dump(man1, open(os.path.join(path, "manifest.json"), "w"))

    b2 = CheckpointedIndexBuilder(path, CFG)
    idx2 = b2.build_fused(docs.repartition(5))
    man2 = json.load(open(os.path.join(path, "manifest.json")))
    for stage in ("partial_segments", "termdict"):
        assert (
            man2["stages"][stage]["finished_at"]
            == man1["stages"][stage]["finished_at"]
        ), f"stage {stage} was rebuilt instead of resumed"
    assert "segments" in man2["stages"]

    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = (
        topk_maxscore(
            q, idx2["segments"], idx2["termdict"], idx2["n_docs"], idx2["avgdl"], CFG
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_fused_build_rank_identical(spark, transcripts_1k, queries_1k):
    """Fused single-pass build (build_index_fused) must answer queries
    rank-identically to the oracle and to the classic pipeline."""
    from nil_spark.operators.segments import build_index_fused

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    idx = build_index_fused(docs.repartition(5), CFG)
    assert idx["n_docs"] == len(transcripts_1k)

    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = (
        topk_maxscore(q, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], CFG)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)

    # docstats sentinels reconstruct the corpus exactly
    import pandas as _pd
    from nil_spark.functions import varint as _v

    sent = idx["docstats_blobs"].toPandas()
    all_ids = np.sort(np.concatenate([_v.decode_deltas(bytes(b)) for b in sent["doc_blob"]]))
    assert (all_ids == np.arange(len(transcripts_1k))).all()


def test_fused_build_ngram5_rank_identical(spark, transcripts_1k, queries_1k):
    """The fused build's globally-vectorized rolling n-gram hash (with
    doc-boundary masking) must be bit-identical to the per-doc oracle
    hashing at gram_size=5 + distinct set semantics."""
    from nil_spark.operators.segments import build_index_fused

    cfg = EngineConfig(gram_size=5, distinct_ngrams=True, num_segments=4)
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    idx = build_index_fused(docs.repartition(5), cfg)
    assert idx["n_docs"] == len(transcripts_1k)
    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = (
        topk_maxscore(q, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], cfg)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, cfg).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_filedirect_build_rank_identical(spark, transcripts_1k, queries_1k, tmp_path):
    """File-direct fused build (workers read range-sorted parquet files
    directly; zero JVM→Python text traffic) must produce the same doc
    ids, corpus stats, and rank-identical results as the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nil_spark.operators.segments import (
        build_partial_segments_from_files,
        index_from_partial_segments,
    )

    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    files = []
    step = (len(ordered) + 7) // 8
    for i in range(8):  # contiguous key ranges = the sorted-write layout
        chunk = ordered.iloc[i * step : (i + 1) * step]
        f = str(tmp_path / f"part-{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), f)
        files.append(f)

    raw = build_partial_segments_from_files(spark, files, CFG).persist()
    idx = index_from_partial_segments(raw, CFG)
    assert idx["n_docs"] == len(transcripts_1k)

    from nil_spark.functions import varint as _v

    sent = idx["docstats_blobs"].toPandas()
    all_ids = np.sort(
        np.concatenate([_v.decode_deltas(bytes(b)) for b in sent["doc_blob"]])
    )
    assert (all_ids == np.arange(len(transcripts_1k))).all()

    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = (
        topk_maxscore(q, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], CFG)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_filedirect_output_build_parity(spark, transcripts_1k, queries_1k, tmp_path):
    """Direct-write file-direct build (workers write their own shard
    parquet with pyarrow; only a manifest row crosses the channel) must
    produce a shard store LOGICALLY IDENTICAL to the Spark-written
    file-direct build — same rows, blobs, and block-max metadata — and
    serve rank-identically through the replica path."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nil_spark.operators.segments import (
        build_partial_segments_from_files,
        build_segment_store_files_direct,
        index_from_partial_segments,
        topk_replica_resident,
    )

    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    files = []
    step = (len(ordered) + 7) // 8
    for i in range(8):
        chunk = ordered.iloc[i * step : (i + 1) * step]
        f = str(tmp_path / f"in-{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), f)
        files.append(f)

    # (a) Spark-written store: the existing fd path
    spark_dir = str(tmp_path / "store_spark")
    build_partial_segments_from_files(spark, files, CFG).write.parquet(spark_dir)
    # (b) worker-written store: the direct-write path
    direct_dir = str(tmp_path / "store_direct")
    manifest = build_segment_store_files_direct(spark, files, CFG, direct_dir)
    assert len(manifest) == 8 and list(manifest["shard"]) == list(range(8))
    assert not glob.glob(direct_dir + "/*.inprogress.*")

    def canon(d):
        pdf = spark.read.parquet(d).toPandas()
        pdf["doc_blob"] = pdf["doc_blob"].apply(bytes)
        pdf["tf_blob"] = pdf["tf_blob"].apply(bytes)
        pdf["dl_blob"] = pdf["dl_blob"].apply(bytes)
        pdf["bm_first"] = pdf["bm_first"].apply(lambda a: tuple(a))
        pdf["bm_max"] = pdf["bm_max"].apply(lambda a: tuple(a))
        return pdf.sort_values(
            ["term", "chunk_idx", "first_doc"], kind="mergesort"
        ).reset_index(drop=True)

    a, b = canon(spark_dir), canon(direct_dir)
    pd.testing.assert_frame_equal(a, b)

    # and the store serves rank-identically to the oracle
    idx = index_from_partial_segments(spark.read.parquet(direct_dir), CFG)
    n_docs, avgdl = idx["n_docs"], idx["avgdl"]
    termdict = idx["termdict"].toPandas()
    if CFG.df_stopword_cutoff < 1.0:  # replica serves from the pruned dict
        termdict = termdict[
            termdict["df"] <= int(CFG.df_stopword_cutoff * n_docs)
        ]

    # the _stats side-cars must reproduce the store-derived stats
    # exactly — corpus scalars and the pruned dictionary
    from nil_spark.operators.segments import read_store_stats

    n2, avg2, td2 = read_store_stats(direct_dir, CFG)
    assert n2 == n_docs
    assert abs(avg2 - avgdl) < 1e-9
    pd.testing.assert_frame_equal(
        td2.sort_values("term").reset_index(drop=True).astype(
            {"term": "int64", "df": "int64"}
        ),
        termdict.sort_values("term").reset_index(drop=True).astype(
            {"term": "int64", "df": "int64"}
        ),
    )
    got = (
        topk_replica_resident(
            spark, queries_1k,
            sorted(manifest["path"]), termdict, n_docs, avgdl, CFG,
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_sharded_topk_rank_identical(spark, transcripts_1k, queries_1k, tmp_path):
    """Document-sharded scatter/gather top-k must equal the oracle."""
    import glob

    from pyspark.sql import functions as F

    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
        topk_maxscore_sharded,
    )

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    shard_dir = str(tmp_path / "shards")
    raw = build_partial_segments(docs.repartition(6), CFG)
    raw.write.parquet(shard_dir)

    raw2 = spark.read.parquet(shard_dir)
    sent = raw2.filter(F.col("term") == DOCSTAT_SENTINEL)
    stats = sent.agg(
        F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["s"]) / int(stats["n"])
    termdict = (
        raw2.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term").agg(F.sum("n_postings").cast("long").alias("df"))
    )
    if CFG.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))
    assert len(paths) >= 2

    got = (
        topk_maxscore_sharded(
            spark, queries_1k, paths, termdict.toPandas(), n_docs, avgdl, CFG
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_replica_topk_rank_identical(spark, transcripts_1k, queries_1k, tmp_path):
    """Replica-resident dense-scoring top-k must equal the oracle."""
    import glob

    from pyspark.sql import functions as F

    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
        topk_replica_resident,
    )

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    shard_dir = str(tmp_path / "rshards")
    build_partial_segments(docs.repartition(6), CFG).write.parquet(shard_dir)

    raw2 = spark.read.parquet(shard_dir)
    sent = raw2.filter(F.col("term") == DOCSTAT_SENTINEL)
    stats = sent.agg(
        F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["s"]) / int(stats["n"])
    termdict = (
        raw2.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term").agg(F.sum("n_postings").cast("long").alias("df"))
    )
    if CFG.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))

    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    td_pdf = termdict.toPandas()
    # both tokenization placements (driver-side list shipping and
    # worker-side broadcast-df tokenize) must be rank-identical
    for mode in ("driver", "worker"):
        got = (
            topk_replica_resident(
                spark, queries_1k, paths, td_pdf, n_docs, avgdl, CFG,
                tokenize_on=mode,
            )
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        assert len(got) == len(oracle), mode
        assert (got["doc_id"].values == oracle["doc_id"].values).all(), mode
        assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6), mode


def test_term_sharded_topk_rank_identical(spark, transcripts_1k, queries_1k, tmp_path):
    """Term-sharded scatter/gather over the merged term-range store:
    footer-statistics routing + cross-shard partial-score reassembly
    must equal the oracle, including terms split across adjacent range
    partitions."""
    import glob

    from pyspark.sql import functions as F

    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
        merge_segments,
        topk_term_sharded,
    )

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    raw = build_partial_segments(docs.repartition(6), CFG)
    merged_dir = str(tmp_path / "merged")
    merge_segments(raw.filter(F.col("term") != DOCSTAT_SENTINEL), CFG).write.parquet(
        merged_dir
    )

    sent = raw.filter(F.col("term") == DOCSTAT_SENTINEL)
    stats = sent.agg(
        F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["s"]) / int(stats["n"])
    merged = spark.read.parquet(merged_dir)
    termdict = merged.groupBy("term").agg(
        F.sum("n_postings").cast("long").alias("df")
    )
    if CFG.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
    paths = sorted(glob.glob(merged_dir + "/part-*.parquet"))
    assert len(paths) >= 2  # routing must actually split the term space

    got = (
        topk_term_sharded(
            spark, queries_1k, paths, termdict.toPandas(), n_docs, avgdl, CFG
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG).topk_frame(queries_1k)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_fused_build_sorts_scrambled_partitions(spark, transcripts_1k):
    """A repartition() upstream of the fused build scrambles row order;
    every chunk must still decode with ascending doc ids and truthful
    [first_doc, last_doc] bounds (MaxScore's range skip depends on
    them)."""
    from pyspark.sql import functions as F

    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        _decode_chunk_table,
        build_partial_segments,
    )

    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    raw = (
        build_partial_segments(docs.repartition(5), CFG)
        .filter(F.col("term") != DOCSTAT_SENTINEL)
        .toPandas()
    )
    assert len(raw) > 100
    for _, r in raw.iterrows():
        _, d, _, _ = _decode_chunk_table(r.to_frame().T.reset_index(drop=True))
        assert (np.diff(d) > 0).all(), f"unsorted chunk for term {r['term']}"
        assert int(r["first_doc"]) == int(d[0]) and int(r["last_doc"]) == int(d[-1])
