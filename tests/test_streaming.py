"""Incremental streaming index: absorb batches via Structured
Streaming, stay rank-identical to the one-shot batch build, skip
already-absorbed files on re-run."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.index import build_index
from nil_spark.operators.query import bm25_topk
from nil_spark.operators.segments import topk_maxscore
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.streaming.incremental import IncrementalIndexer

CFG = EngineConfig(gram_size=1, num_segments=4, block_size=16)


@pytest.fixture(scope="module")
def stream_built(spark, transcripts_1k, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    input_dir, index_dir = str(tmp / "in"), str(tmp / "idx")
    os.makedirs(input_dir)

    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    half = len(ordered) // 2
    ix = IncrementalIndexer(index_dir, CFG)
    # two arrivals: write file, drain stream, write next, drain again
    for i, part in enumerate((ordered.iloc[:half], ordered.iloc[half:])):
        spark.createDataFrame(part, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(input_dir, f"arrival{i}"))
        ix.run_available(spark, input_dir + "/arrival*")
    return ix, input_dir, index_dir


def test_stream_matches_batch_build(spark, transcripts_1k, queries_1k, stream_built):
    ix, _, _ = stream_built
    idx_s = ix.load_index(spark)
    assert idx_s["n_docs"] == len(transcripts_1k)

    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = (
        topk_maxscore(q, idx_s["segments"], idx_s["termdict"], idx_s["n_docs"], idx_s["avgdl"], CFG)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )

    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
    )
    idx_b = build_index(docs, CFG)
    exp = (
        bm25_topk(q, idx_b, CFG)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-9)


def test_stream_lineage_and_exactly_once(spark, stream_built):
    ix, input_dir, index_dir = stream_built
    man = json.load(open(os.path.join(index_dir, "stream_manifest.json")))
    assert len(man["batches"]) == 2
    ranges = [b["doc_id_range"] for b in man["batches"]]
    assert ranges[0][1] == ranges[1][0]  # contiguous id ranges
    assert man["next_doc_id"] == ranges[1][1]

    # re-run with no new files: checkpoint must skip everything
    ix2 = IncrementalIndexer(index_dir, CFG)
    ix2.run_available(spark, input_dir + "/arrival*")
    man2 = json.load(open(os.path.join(index_dir, "stream_manifest.json")))
    assert len(man2["batches"]) == 2
    assert man2["next_doc_id"] == man["next_doc_id"]


def test_legacy_manifest_guard(tmp_path):
    """A pre-fingerprint-guard manifest must not be silently stamped
    with the CURRENT fingerprint: if on-disk segments use the v1 schema
    (no last_doc) the open fails with the structured config-mismatch
    error, not a raw missing-column AnalysisException mid-query.  A
    legacy manifest with no absorbed batches is safe to stamp."""
    import pandas as pd

    # v1 segments on disk -> refuse
    idx1 = tmp_path / "legacy_v1"
    seg_dir = idx1 / "segments" / "batch_id=0"
    os.makedirs(seg_dir)
    pd.DataFrame({"term": [1], "n_postings": [1]}).to_parquet(
        seg_dir / "part-00000.parquet"
    )
    json.dump(
        {"next_doc_id": 5, "batches": [{"batch_id": 0, "rows": 5,
                                        "doc_id_range": [0, 5]}]},
        open(idx1 / "stream_manifest.json", "w"),
    )
    with pytest.raises(ValueError, match="config mismatch"):
        IncrementalIndexer(str(idx1), CFG)

    # legacy manifest, nothing absorbed -> stamped with current fp
    idx2 = tmp_path / "legacy_empty"
    os.makedirs(idx2)
    json.dump({"next_doc_id": 0, "batches": []},
              open(idx2 / "stream_manifest.json", "w"))
    ix = IncrementalIndexer(str(idx2), CFG)
    assert ix.manifest["config_fingerprint"]


def test_stream_retry_idempotent(spark, transcripts_1k, queries_1k, stream_built):
    """foreachBatch is at-least-once: redelivery of a batch — both after
    a clean commit and after a simulated crash between the parquet write
    and the checkpoint commit — must not duplicate postings, docstats,
    or doc-id lineage."""
    ix, _, index_dir = stream_built
    man_path = os.path.join(index_dir, "stream_manifest.json")
    man = json.load(open(man_path))
    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    second = ordered.iloc[len(ordered) // 2 :]
    df2 = spark.createDataFrame(second, schema=TRANSCRIPT_SCHEMA)

    n_stats_before = spark.read.parquet(os.path.join(index_dir, "docstats")).count()

    # redelivery of a recorded batch: pure no-op
    ix.absorb_batch(df2, 1)
    assert json.load(open(man_path)) == man
    assert (
        spark.read.parquet(os.path.join(index_dir, "docstats")).count()
        == n_stats_before
    )

    # crash-before-record replay: roll the manifest back to post-batch-0
    # (files for batch 1 are still on disk — the partial-write case)
    rolled = {
        "next_doc_id": man["batches"][0]["doc_id_range"][1],
        "batches": man["batches"][:1],
    }
    json.dump(rolled, open(man_path, "w"))
    ix2 = IncrementalIndexer(index_dir, CFG)
    ix2.absorb_batch(df2, 1)

    man2 = json.load(open(man_path))
    assert len(man2["batches"]) == 2
    assert man2["next_doc_id"] == man["next_doc_id"]
    assert man2["batches"][1]["doc_id_range"] == man["batches"][1]["doc_id_range"]

    idx_s = ix2.load_index(spark)
    assert idx_s["n_docs"] == len(transcripts_1k)
    ds = spark.read.parquet(os.path.join(index_dir, "docstats"))
    assert ds.count() == ds.select("doc_id").distinct().count() == len(transcripts_1k)


def test_compact_publishes_replica_store(
    spark, transcripts_1k, tmp_path, monkeypatch
):
    """compact(publish=True) must leave a completed mmap replica store
    under the SAME key the serving side computes (generation shard
    paths + docstats avgdl) — so the first query batch after a
    compaction attaches instead of re-decoding the new generation."""
    import glob

    from nil_spark.operators.index import corpus_stats
    from nil_spark.operators.segments import _replica_store_dir

    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path / "store"))
    os.makedirs(tmp_path / "store")
    input_dir, index_dir = str(tmp_path / "in"), str(tmp_path / "idx")
    os.makedirs(input_dir)
    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True).iloc[:400]
    ix = IncrementalIndexer(index_dir, CFG)
    spark.createDataFrame(ordered, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(input_dir, "arrival0"))
    ix.run_available(spark, input_dir + "/arrival*")
    r = ix.compact(spark, publish=True)
    store = r["replica_store"]
    assert os.path.exists(os.path.join(store, "DONE"))

    # the serving side (cli._open_streaming_index style) derives paths
    # from the generation dir and avgdl from docstats: same store key
    paths = tuple(sorted(glob.glob(
        os.path.join(index_dir, "compacted", f"gen={r['compacted_gen']}",
                     "part-*.parquet")
    )))
    assert paths
    _, avgdl = corpus_stats(
        spark.read.parquet(os.path.join(index_dir, "docstats"))
    )
    key = (paths, round(avgdl, 9), CFG.bm25_k1, CFG.bm25_b)
    assert _replica_store_dir(key, paths) == store


def test_compaction_rank_identical_and_cleans_deltas(
    spark, transcripts_1k, queries_1k, tmp_path
):
    """compact() merges batch deltas into one term-sorted generation:
    query results stay rank-identical to the batch build across
    compact -> absorb-more -> compact-again, deltas are removed, and a
    leftover already-merged delta (crash between manifest record and
    dir deletion) is partition-pruned, not double-counted."""
    input_dir, index_dir = str(tmp_path / "in"), str(tmp_path / "idx")
    os.makedirs(input_dir)
    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    third = len(ordered) // 3
    parts = (ordered.iloc[:third], ordered.iloc[third : 2 * third], ordered.iloc[2 * third :])
    ix = IncrementalIndexer(index_dir, CFG)
    for i, part in enumerate(parts[:2]):
        spark.createDataFrame(part, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(input_dir, f"arrival{i}"))
        ix.run_available(spark, input_dir + "/arrival*")

    r = ix.compact(spark)
    assert r["compacted_gen"] == 1 and r["merged_batches"] == 2
    seg_root = os.path.join(index_dir, "segments")
    assert not any(e.startswith("batch_id=") for e in os.listdir(seg_root))

    # late arrival after compaction -> mixed generation + delta serving
    spark.createDataFrame(parts[2], schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(input_dir, "arrival2"))
    ix.run_available(spark, input_dir + "/arrival*")

    def _topk(idx):
        q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
        return (
            topk_maxscore(q, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], CFG)
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )

    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
    )
    exp = (
        bm25_topk(
            spark.createDataFrame(queries_1k, schema="query_id long, text string, k int"),
            build_index(docs, CFG), CFG,
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    got = _topk(ix.load_index(spark))
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-9)

    # second compaction folds gen=1 + the late delta into gen=2
    r2 = ix.compact(spark)
    assert r2["compacted_gen"] == 2 and r2["merged_batches"] == 1
    got2 = _topk(ix.load_index(spark))
    assert (got2["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got2["bm25"].values, exp["bm25"].values, atol=1e-9)

    # crash window: resurrect an already-merged delta dir; load_index
    # must prune it by batch_id instead of double-counting
    import shutil

    man = json.load(open(ix.manifest_path))
    bid = man["compacted_batch_ids"][0]
    src = os.path.join(index_dir, "compacted", "gen=2")
    fake_delta = os.path.join(seg_root, f"batch_id={bid}")
    shutil.copytree(src, fake_delta)
    got3 = _topk(ix.load_index(spark))
    assert (got3["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got3["bm25"].values, exp["bm25"].values, atol=1e-9)

    # idempotent no-op when nothing new arrived
    shutil.rmtree(fake_delta)
    assert ix.compact(spark)["merged_batches"] == 0


# ------------------------------------------- positional side-car deltas


def test_stream_positions_match_batch_store(
    spark, transcripts_1k, tmp_path_factory
):
    """Phrase + proximity answers from the streaming positional deltas
    must equal the batch-built positional store when batches arrive in
    (conv_id, turn_idx) order — the same parity contract the frequency
    index carries."""
    import pandas as pd

    from nil_spark.operators.positions import (
        build_position_segments,
        phrase_search_positional,
        proximity_search_positional,
    )

    tmp = tmp_path_factory.mktemp("stream_pos")
    input_dir, index_dir = str(tmp / "in"), str(tmp / "idx")
    os.makedirs(input_dir)
    ordered = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    half = len(ordered) // 2
    ix = IncrementalIndexer(index_dir, CFG, positions=True)
    for i, part in enumerate((ordered.iloc[:half], ordered.iloc[half:])):
        spark.createDataFrame(part, schema=TRANSCRIPT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(
            os.path.join(input_dir, f"arrival{i}")
        )
        ix.run_available(spark, input_dir + "/arrival*")
    assert ix.manifest["positions"] is True
    s_store = ix.position_store(spark)

    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
    )
    b_dir = str(tmp / "batch_pos")
    build_position_segments(
        docs.select("doc_id", "text"), CFG
    ).write.mode("overwrite").parquet(b_dir)
    b_store = spark.read.parquet(b_dir)

    # phrase query from real corpus text: first bigram of the first doc
    first_toks = ordered["text"].iloc[0].lower().split()
    queries = pd.DataFrame(
        {"query_id": [0], "text": [f"{first_toks[0]} {first_toks[1]}"]}
    )
    for fn, kw in (
        (phrase_search_positional, {}),
        (proximity_search_positional, {"k": 10}),
    ):
        got = (
            fn(spark, queries, s_store, CFG, **kw)
            .toPandas().sort_values(["query_id", "doc_id"])
            .reset_index(drop=True)
        )
        exp = (
            fn(spark, queries, b_store, CFG, **kw)
            .toPandas().sort_values(["query_id", "doc_id"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0, fn.__name__
        pd.testing.assert_frame_equal(got, exp)

    # reopening WITHOUT the flag adopts the manifest (keeps absorbing)
    ix2 = IncrementalIndexer(index_dir, CFG)
    assert ix2.positions is True


def test_positions_cannot_be_enabled_after_the_fact(
    spark, transcripts_1k, tmp_path_factory
):
    """The coverage invariant: a positional store missing some absorbed
    docs would silently report 'no match' — enabling positions on an
    index with position-less batches is refused."""
    tmp = tmp_path_factory.mktemp("stream_pos_late")
    input_dir, index_dir = str(tmp / "in"), str(tmp / "idx")
    os.makedirs(input_dir)
    part = transcripts_1k.iloc[:100]
    ix = IncrementalIndexer(index_dir, CFG)
    spark.createDataFrame(part, schema=TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(input_dir, "arrival0"))
    ix.run_available(spark, input_dir + "/arrival*")
    with pytest.raises(ValueError, match="WITHOUT a positional store"):
        IncrementalIndexer(index_dir, CFG, positions=True)
