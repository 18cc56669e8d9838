"""Pluggable similarity (Lucene setSimilarity analog): LM Dirichlet
serving from the replica kernel must be rank- AND score-identical to
the pure-Python oracle, from the same index that serves BM25 —
similarity is a query-time choice, not an index rebuild.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    _REPLICA_CACHE,
    build_partial_segments,
    topk_replica_resident,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_queries, gen_transcripts
from nil_spark.testing.oracle import OracleIndex

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = EngineConfig(gram_size=1, num_segments=4, block_size=16)


@pytest.fixture(scope="module")
def built(spark, transcripts_1k, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lmd_shards") / "shards")
    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    build_partial_segments(docs.repartition(4), CFG).write.parquet(d)
    raw = spark.read.parquet(d)
    st = (
        raw.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(
            F.sum("n_postings").alias("n"),
            F.sum(F.element_at("bm_max", 1)).alias("s"),
        )
        .collect()[0]
    )
    n_docs = int(st["n"])
    avgdl = float(st["s"]) / n_docs
    # df-based stopword pruning, as _open_index applies it: terms past
    # the cutoff never enter the term dictionary, so the kernel skips
    # them (the oracle prunes identically)
    termdict = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").alias("df"))
        .filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
        .toPandas()
    )
    paths = sorted(glob.glob(d + "/part-*.parquet"))
    return paths, termdict, n_docs, avgdl


@pytest.mark.parametrize("tokenize_on", ["driver", "worker"])
def test_lmd_replica_matches_oracle(spark, transcripts_1k, built, tokenize_on, tmp_path, monkeypatch):
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    _REPLICA_CACHE.clear()
    paths, termdict, n_docs, avgdl = built
    q = gen_queries(transcripts_1k, n_queries=12, k=7, seed=71)
    got = (
        topk_replica_resident(
            spark, q, paths, termdict, n_docs, avgdl, CFG,
            tokenize_on=tokenize_on, similarity="lmd",
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        OracleIndex(transcripts_1k, CFG)
        .lmd_topk_frame(q, mu=CFG.lmd_mu)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["query_id"].values == exp["query_id"].values).all()
    assert (got["doc_id"].values == exp["doc_id"].values).all(), (
        pd.concat([got, exp], axis=1).head(20)
    )
    assert np.allclose(got["bm25"].values, exp["score"].values, atol=1e-6)


def test_lmd_differs_from_bm25(spark, transcripts_1k, built, tmp_path, monkeypatch):
    """The flag must actually change the ranking somewhere — otherwise
    the test above could pass with similarity silently ignored."""
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    _REPLICA_CACHE.clear()
    paths, termdict, n_docs, avgdl = built
    q = gen_queries(transcripts_1k, n_queries=12, k=7, seed=72)
    a = topk_replica_resident(
        spark, q, paths, termdict, n_docs, avgdl, CFG, similarity="lmd"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    _REPLICA_CACHE.clear()
    b = topk_replica_resident(
        spark, q, paths, termdict, n_docs, avgdl, CFG, similarity="bm25"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert not np.allclose(
        a["bm25"].values[: min(len(a), len(b))],
        b["bm25"].values[: min(len(a), len(b))],
    )


def _run_cli(args: list) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"), "--master", "local[2]",
         "--shuffle-partitions", "4", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


def test_cli_similarity_lmd(tmp_path):
    pdf = gen_transcripts(300, seed=73)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), str(tmp_path / "corpus.parquet")
    )
    idx_dir = str(tmp_path / "idx")
    out = _run_cli(["build", "--input", str(tmp_path / "corpus.parquet"),
                    "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]

    q = gen_queries(pdf, n_queries=6, k=5, seed=74)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), str(tmp_path / "q.parquet"))
    res = str(tmp_path / "res")
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp_path / "q.parquet"), "--out", res,
                    "--topology", "replica", "--similarity", "lmd"])
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert "score" in got.columns and "bm25" not in got.columns
    exp = (
        OracleIndex(pdf, EngineConfig(gram_size=1))
        .lmd_topk_frame(q)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["score"].values, exp["score"].values, atol=1e-6)

    # wrong-topology refusal is structured, exit 2
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp_path / "q.parquet"), "--out", str(tmp_path / "r2"),
                    "--similarity", "lmd"])
    assert out.returncode == 2
    err = json.loads(out.stderr.strip().splitlines()[-1])
    assert "similarity" in err["error"]
