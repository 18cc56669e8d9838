"""Federated multi-index search (operators/federated.py): a corpus
split in global doc order across two member indexes, queried through
the federation, is BIT-IDENTICAL — ids, scores, ranks, tie-breaks — to
the single whole-corpus index.  Plus: member tombstones, config-drift
refusal, and the CLI comma-separated --index-dir surface."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.federated import (
    FederatedIndexError,
    federated_topk,
    open_federated,
)
from nil_spark.operators.segments import CheckpointedIndexBuilder, topk_maxscore
from nil_spark.sources.transcripts import gen_queries, gen_transcripts

# cutoff disabled: build-time pruning uses LOCAL df, which would leave
# members missing postings the whole-corpus index keeps (documented
# federated.py caveat) — disable it so the identity is exact
CFG = EngineConfig(gram_size=1, df_stopword_cutoff=2.0)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build(spark, pdf: pd.DataFrame, path: str) -> dict:
    docs = assign_doc_ids(spark.createDataFrame(pdf))
    return CheckpointedIndexBuilder(path, CFG).build_fused(docs)


@pytest.fixture(scope="module")
def fed_setup(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("federated")
    pdf = gen_transcripts(600, seed=31).sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    half_a, half_b = pdf.iloc[:300], pdf.iloc[300:]
    whole_dir = str(tmp / "whole")
    a_dir, b_dir = str(tmp / "part_a"), str(tmp / "part_b")
    _build(spark, pdf, whole_dir)
    _build(spark, half_a, a_dir)
    _build(spark, half_b, b_dir)
    q = gen_queries(pdf, n_queries=10, k=5, seed=33)
    return tmp, pdf, whole_dir, a_dir, b_dir, q


def _whole_topk(spark, whole_dir: str, q: pd.DataFrame) -> pd.DataFrame:
    with open(os.path.join(whole_dir, "manifest.json")) as f:
        man = json.load(f)
    segs = spark.read.parquet(os.path.join(whole_dir, "segments"))
    td = spark.read.parquet(os.path.join(whole_dir, "termdict"))
    out = topk_maxscore(
        spark.createDataFrame(q), segs, td,
        int(man["corpus"]["n_docs"]), float(man["corpus"]["avgdl"]), CFG,
    )
    return (
        out.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def _fed_topk(spark, dirs, q: pd.DataFrame, topology: str) -> pd.DataFrame:
    fed = open_federated(spark, dirs, CFG)
    out = federated_topk(
        spark, spark.createDataFrame(q), fed, CFG, topology=topology
    )
    return (
        out.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def _assert_identical(fed_pdf: pd.DataFrame, whole_pdf: pd.DataFrame):
    assert len(fed_pdf) == len(whole_pdf) > 0
    assert (fed_pdf["query_id"].values == whole_pdf["query_id"].values).all()
    assert (fed_pdf["rank"].values == whole_pdf["rank"].values).all()
    # docBase offsets make member-local ids the whole-corpus ids
    assert (fed_pdf["doc_id"].values == whole_pdf["doc_id"].values).all()
    assert np.allclose(
        fed_pdf["bm25"].values, whole_pdf["bm25"].values, atol=1e-9
    )


def test_federated_join_identity(spark, fed_setup):
    _, _, whole_dir, a_dir, b_dir, q = fed_setup
    fed = _fed_topk(spark, [a_dir, b_dir], q, "join")
    _assert_identical(fed, _whole_topk(spark, whole_dir, q))
    # the ES _index column routes each hit to its member
    assert set(fed["index"].unique()) <= {"part_a", "part_b"}
    assert fed["index"].nunique() == 2  # both members contribute


def test_federated_replica_identity(spark, fed_setup):
    _, _, whole_dir, a_dir, b_dir, q = fed_setup
    fed = _fed_topk(spark, [a_dir, b_dir], q, "replica")
    _assert_identical(fed, _whole_topk(spark, whole_dir, q))


def test_federated_member_tombstones(spark, fed_setup, tmp_path):
    """Tombstoning a doc in member B removes exactly that global doc
    from federated results while every query still fills its k."""
    tmp, _, _, a_dir, b_dir, q = fed_setup
    base = _fed_topk(spark, [a_dir, b_dir], q, "join")
    victim = base[base["index"] == "part_b"].iloc[0]
    local_id = int(victim["doc_id"]) - 300  # docBase of part_b
    # a separate copy of part_b so the module fixture stays pristine
    import shutil

    b2_dir = str(tmp_path / "part_b")
    shutil.copytree(b_dir, b2_dir)
    from nil_spark.operators.deletes import append_tombstones

    append_tombstones(
        spark, b2_dir,
        spark.createDataFrame([(local_id,)], "doc_id long"),
    )
    got = _fed_topk(spark, [a_dir, b2_dir], q, "join")
    assert int(victim["doc_id"]) not in set(
        got[got["query_id"] == victim["query_id"]]["doc_id"]
    )
    # every query still fills k (over-retrieve + trim is exact)
    assert (
        got.groupby("query_id").size().values
        == base.groupby("query_id").size().values
    ).all()


def test_federated_config_drift_refused(spark, fed_setup):
    _, _, _, a_dir, b_dir, _ = fed_setup
    with pytest.raises(FederatedIndexError, match="config mismatch"):
        open_federated(spark, [a_dir, b_dir], EngineConfig(gram_size=3))
    with pytest.raises(FederatedIndexError, match=">= 2"):
        open_federated(spark, [a_dir], CFG)


def _run_cli(args: list) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"),
         "--master", "local[2]", "--shuffle-partitions", "4",
         "--stopword-cutoff", "2.0", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


def test_cli_federated_query(spark, fed_setup):
    tmp, _, whole_dir, a_dir, b_dir, q = fed_setup
    pq.write_table(
        pa.Table.from_pandas(q, preserve_index=False), str(tmp / "q.parquet")
    )
    out = _run_cli(["query", "--index-dir", f"{a_dir},{b_dir}",
                    "--queries", str(tmp / "q.parquet"),
                    "--out", str(tmp / "fres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["members"] == ["part_a", "part_b"]
    assert info["n_docs"] == 600
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp / "fres", f)).to_pandas()
            for f in os.listdir(tmp / "fres")
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    _assert_identical(got, _whole_topk(spark, whole_dir, q))


def test_cli_federated_refuses_incompatible_flags(fed_setup):
    tmp, _, _, a_dir, b_dir, _ = fed_setup
    out = _run_cli(["query", "--index-dir", f"{a_dir},{b_dir}",
                    "--queries", str(tmp / "q.parquet"),
                    "--out", str(tmp / "xres"), "--topology", "wand"])
    assert out.returncode == 2, out.stdout[-1500:] + out.stderr[-1500:]
    assert "unsupported with a multi-index" in out.stderr
