"""Doc-values side-car (Lucene NumericDocValues) and its two in-kernel
consumers on the replica topology: function_score gaussian decay and
sort-by-field retrieval — both pinned to the pure-Python oracle through
the CLI in fresh JVMs.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nil_spark.config import EngineConfig
from nil_spark.operators.docvalues import (
    _build_dense_array,
    gauss_factor,
    sort_key,
)
from nil_spark.sources.transcripts import gen_queries, gen_transcripts
from nil_spark.testing.oracle import OracleIndex

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = EngineConfig(gram_size=1)


# ------------------------------------------------------- unit kernels


def test_dense_array_and_factors(tmp_path):
    pq.write_table(
        pa.table({"doc_id": [0, 2, 5], "value": [10.0, 20.0, 30.0]}),
        str(tmp_path / "part-0.parquet"),
    )
    (arr,) = _build_dense_array(str(tmp_path))
    assert len(arr) == 6
    assert arr[0] == 10.0 and arr[2] == 20.0 and arr[5] == 30.0
    assert np.isnan(arr[1]) and np.isnan(arr[3])

    ids = np.array([0, 1, 5, 9])  # 1 = NaN value, 9 = past the array
    f = gauss_factor(arr, ids, origin=10.0, sigma=10.0)
    assert f[0] == pytest.approx(1.0)
    assert f[1] == 1.0 and f[3] == 1.0  # missing decays nothing
    assert f[2] == pytest.approx(math.exp(-(20.0**2) / 200.0))

    kd = sort_key(arr, ids, ascending=False)
    assert kd[1] == -np.inf and kd[3] == -np.inf  # missing last on desc
    ka = sort_key(arr, ids, ascending=True)
    assert ka[1] == np.inf and ka[3] == np.inf


# ------------------------------------------------------------ CLI e2e


def _run_cli(args: list) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"), "--master", "local[2]",
         "--shuffle-partitions", "4", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dv")
    pdf = gen_transcripts(300, seed=81)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), str(tmp / "corpus.parquet")
    )
    idx_dir = str(tmp / "idx")
    out = _run_cli(["build", "--input", str(tmp / "corpus.parquet"),
                    "--index-dir", idx_dir, "--docvalues", "ts"])
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["docvalues"] == ["ts"]
    q = gen_queries(pdf, n_queries=6, k=5, seed=82)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), str(tmp / "q.parquet"))
    # oracle-side doc_id -> epoch-second value map, same stable order
    # as assign_doc_ids
    srt = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    values = {
        i: t.value / 1e9 for i, t in enumerate(pd.to_datetime(srt["ts"]))
    }
    return tmp, idx_dir, pdf, q, values


def _read_res(res: str) -> pd.DataFrame:
    return (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_cli_decay_matches_oracle(built):
    tmp, idx_dir, pdf, q, values = built
    origin = max(values.values())
    sigma = 3600.0 * 24 * 2  # two days
    res = str(tmp / "res_decay")
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", res,
                    "--topology", "replica",
                    "--decay", f"ts:max:{sigma}"])
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    got = _read_res(res)
    assert "score" in got.columns
    oracle = OracleIndex(pdf, CFG)
    rows = []
    for _, qq in q.iterrows():
        for rank, did, s in oracle.decay_topk(
            qq["text"], int(qq["k"]), values, origin, sigma
        ):
            rows.append((int(qq["query_id"]), rank, did, s))
    exp = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all(), (
        pd.concat([got, exp], axis=1).head(20)
    )
    assert np.allclose(got["score"].values, exp["score"].values, atol=1e-6)
    # decay must actually reorder vs plain BM25 somewhere
    res_plain = str(tmp / "res_plain")
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", res_plain,
                    "--topology", "replica"])
    assert out.returncode == 0
    plain = _read_res(res_plain)
    assert not (got["doc_id"].values == plain["doc_id"].values).all()


def test_cli_sort_by_matches_oracle(built):
    tmp, idx_dir, pdf, q, values = built
    res = str(tmp / "res_sort")
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", res,
                    "--topology", "replica", "--sort-by", "ts:desc"])
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    got = _read_res(res)
    assert "sort_value" in got.columns
    oracle = OracleIndex(pdf, CFG)
    rows = []
    for _, qq in q.iterrows():
        for rank, did, v in oracle.sortfield_topk(
            qq["text"], int(qq["k"]), values, ascending=False
        ):
            rows.append((int(qq["query_id"]), rank, did, v))
    exp = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "sort_value"])
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all(), (
        pd.concat([got, exp], axis=1).head(20)
    )
    assert np.allclose(got["sort_value"].values, exp["sort_value"].values,
                       atol=1e-5)


def test_cli_docvalues_refusals(built):
    tmp, idx_dir, pdf, q, values = built
    # no docvalues store for the named field
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", str(tmp / "r1"),
                    "--topology", "replica", "--decay", "turn_idx:max:10"])
    assert out.returncode == 2
    assert "doc-values" in json.loads(out.stderr.strip().splitlines()[-1])["error"]
    # wrong topology
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", str(tmp / "r2"),
                    "--sort-by", "ts"])
    assert out.returncode == 2
    # decay + sort-by
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", str(tmp / "r3"),
                    "--topology", "replica", "--decay", "ts:max:10",
                    "--sort-by", "ts"])
    assert out.returncode == 2
    # malformed spec
    out = _run_cli(["query", "--index-dir", idx_dir, "--queries",
                    str(tmp / "q.parquet"), "--out", str(tmp / "r4"),
                    "--topology", "replica", "--decay", "ts:oops"])
    assert out.returncode == 2
