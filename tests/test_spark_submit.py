"""North-rule packaging evidence: the engine must run via
``spark-submit --py-files nil_spark.zip`` on a multi-executor cluster.

This test does it for real — not a ``python`` subprocess emulation:
``nil_spark`` is zipped, ``cli_main.py`` is copied into an EMPTY temp
directory (so the package can come ONLY from the ``--py-files`` zip:
the script dir that Python prepends to ``sys.path`` contains nothing,
and the cwd is not the repo), and the actual ``spark-submit`` binary
builds an index and serves queries in fresh JVMs.  Results are pinned
rank- and score-identical to the pure-Python oracle.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nil_spark import EngineConfig
from nil_spark.sources.transcripts import gen_queries, gen_transcripts
from nil_spark.testing.oracle import OracleIndex

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not on this host"
)


def _make_zip(dest: str) -> str:
    zpath = os.path.join(dest, "nil_spark.zip")
    pkg = os.path.join(REPO, "nil_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(workdir: str, zpath: str, args: list) -> subprocess.CompletedProcess:
    # run from the bare workdir: cli_main.py is the primary resource
    # there, and nil_spark resolves through the --py-files zip only
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(workdir, "cli_main.py"),
            *args,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=workdir,
        env={**os.environ, "PYTHONPATH": ""},
    )


def test_spark_submit_build_and_query_rank_identical(tmp_path):
    work = str(tmp_path / "work")
    os.makedirs(work)
    shutil.copy(os.path.join(REPO, "cli_main.py"), work)
    zpath = _make_zip(work)

    pdf = gen_transcripts(300, seed=51)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), str(tmp_path / "corpus.parquet")
    )
    q = gen_queries(pdf, n_queries=6, k=5, seed=52)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), str(tmp_path / "q.parquet"))

    idx_dir = str(tmp_path / "idx")
    out = _submit(work, zpath, [
        "build", "--input", str(tmp_path / "corpus.parquet"), "--index-dir", idx_dir,
    ])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 300

    res = str(tmp_path / "res")
    out = _submit(work, zpath, [
        "query", "--index-dir", idx_dir,
        "--queries", str(tmp_path / "q.parquet"), "--out", res,
    ])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    got = (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    oracle = (
        OracleIndex(pdf, EngineConfig(gram_size=1))
        .topk_frame(q)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_spark_submit_zip_is_the_only_package_source(tmp_path):
    """Without the --py-files zip the same submission must FAIL to
    import nil_spark — proving the passing test above exercises the
    zip, not a stray repo path."""
    work = str(tmp_path / "work")
    os.makedirs(work)
    shutil.copy(os.path.join(REPO, "cli_main.py"), work)

    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            os.path.join(work, "cli_main.py"),
            "stats", "--index-dir", str(tmp_path / "nope"),
        ],
        capture_output=True,
        text=True,
        timeout=180,
        cwd=work,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode != 0
    blob = out.stdout + out.stderr
    assert "ModuleNotFoundError" in blob or "No module named" in blob
