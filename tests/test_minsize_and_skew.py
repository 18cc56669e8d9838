"""T4/T5 min-size scan predicates (reference minLine/minToken,
AntlrTransformer.kt:41-47) across ALL build paths, and an adversarial
hot-term skew stress on the composite (term, doc_id) range key."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from nil_spark.config import EngineConfig
from nil_spark.functions.hashing import fnv1a64
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.index import build_index
from nil_spark.operators.query import bm25_topk
from nil_spark.operators.segments import (
    CheckpointedIndexBuilder,
    build_index_fused,
    topk_maxscore,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.testing.oracle import OracleIndex

# drops ~1/3 of the 1k fixture by tokens and ~1/5 by chars — both
# predicates genuinely fire (reference defaults are minLine=6/minToken=50)
CFG_MIN = EngineConfig(gram_size=1, min_tokens=20, min_chars=80)


def _rank_identical(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)}"
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-6)


def test_min_size_predicates_classic(spark, transcripts_1k, queries_1k):
    oracle = OracleIndex(transcripts_1k, CFG_MIN)
    assert 0 < oracle.n_docs < len(transcripts_1k), "predicates must fire"

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    idx = build_index(docs, CFG_MIN)
    assert idx["n_docs"] == oracle.n_docs
    assert abs(idx["avgdl"] - oracle.avgdl) < 1e-9
    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    _rank_identical(bm25_topk(q, idx, CFG_MIN).toPandas(), oracle.topk_frame(queries_1k))
    # no filtered doc may appear in any result
    dropped = set(range(len(transcripts_1k))) - set(oracle.kept)
    got_ids = set(bm25_topk(q, idx, CFG_MIN).toPandas()["doc_id"])
    assert not (got_ids & dropped)


def test_min_size_predicates_fused(spark, transcripts_1k, queries_1k):
    """The fused single-Arrow-stage build must apply the same min-size
    predicates as the classic path (postings AND docstats sentinel)."""
    oracle = OracleIndex(transcripts_1k, CFG_MIN)
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    idx = build_index_fused(docs.repartition(5), CFG_MIN)
    assert idx["n_docs"] == oracle.n_docs
    assert abs(idx["avgdl"] - oracle.avgdl) < 1e-9
    q = spark.createDataFrame(queries_1k, schema="query_id long, text string, k int")
    got = topk_maxscore(
        q, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], CFG_MIN
    ).toPandas()
    _rank_identical(got, oracle.topk_frame(queries_1k))


def test_hot_term_skew_spread(spark, transcripts_1k, queries_1k, tmp_path):
    """Plant terms far beyond Zipf (each in ~60% of docs) and verify the
    composite (term, doc_id) range key's salting claim: per-partition
    posting counts stay within 2x of the median, each hot term's
    postings span multiple segment files, and rank identity holds."""
    t = transcripts_1k.copy()
    hot = ["hottokena", "hottokenb", "hottokenc"]
    mask = np.arange(len(t)) % 10 < 6
    t.loc[mask, "text"] = t.loc[mask, "text"] + " " + " ".join(hot)
    cfg = EngineConfig(gram_size=1, num_segments=64, df_stopword_cutoff=1.0)

    docs = assign_doc_ids(
        spark.createDataFrame(t, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    builder = CheckpointedIndexBuilder(str(tmp_path / "idx"), cfg)
    idx = builder.build(docs)
    idx["segments"].count()  # materialize the checkpointed store

    files = sorted(glob.glob(str(tmp_path / "idx" / "segments" / "part-*.parquet")))
    assert len(files) > 8
    per_file = []
    hot_ids = {fnv1a64(h) for h in hot}
    hot_files = {h: set() for h in hot_ids}
    for f in files:
        tbl = pq.read_table(f, columns=["term", "n_postings"])
        n = int(np.sum(tbl["n_postings"].to_numpy())) if tbl.num_rows else 0
        per_file.append(n)
        for tm in set(tbl["term"].to_numpy().tolist()) & hot_ids:
            hot_files[tm].add(f)
    nonzero = [n for n in per_file if n > 0]
    med = float(np.median(nonzero))
    assert max(nonzero) <= 2.0 * med, (max(nonzero), med, sorted(nonzero)[-5:])
    # every hot term is split across >1 segment file (doc_id salt fires)
    for tm, fs in hot_files.items():
        assert len(fs) > 1, f"hot term {tm} landed in a single partition"
    # manifest records the per-partition lineage for the segments stage
    assert builder.manifest["stages"]["segments"]["partitions"]

    # rank identity with hot-term queries against the oracle
    q = queries_1k.copy()
    q.loc[: len(q) // 2, "text"] = q.loc[: len(q) // 2, "text"] + " hottokena hottokenb"
    oracle = OracleIndex(t, cfg)
    qdf = spark.createDataFrame(q, schema="query_id long, text string, k int")
    got = topk_maxscore(
        qdf, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], cfg
    ).toPandas()
    _rank_identical(got, oracle.topk_frame(q))
