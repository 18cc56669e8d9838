"""Compaction (operators/compact.py + CLI `compact`).

The defining property: after delete + compact, the index must answer
EXACTLY like a fresh index built over the corpus minus the deleted
docs — same ranks, same BM25 scores (stats refreshed), for both ranked
and positional (phrase) serving — modulo the doc-id mapping (surviving
docs keep their original ids; the fresh build renumbers densely, and
both assignments order by the same (conv_id, turn_idx) key, so the
mapping is monotone and tie order is preserved)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nil_spark.sources.transcripts import gen_queries, gen_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"),
         "--master", "local[2]", "--shuffle-partitions", "4", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


def _read_dir(d) -> pd.DataFrame:
    return pd.concat(
        pq.read_table(os.path.join(d, f)).to_pandas()
        for f in os.listdir(d) if f.endswith(".parquet")
    ).reset_index(drop=True)


def test_compact_equals_reindex(tmp_path):
    pdf = gen_transcripts(300, seed=71)
    ordered = pdf.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)

    # delete 30 docs spread over the id space
    dead_ids = list(range(3, 300, 10))
    keep_mask = ~ordered.index.isin(dead_ids)
    reduced = ordered[keep_mask].reset_index(drop=True)
    # fresh build renumbers densely in the same key order: mapping
    # fresh_id -> original_id is the kept original ids in order
    fresh_to_orig = ordered.index[keep_mask].to_numpy(np.int64)

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(tmp_path / "full.parquet"))
    pq.write_table(pa.Table.from_pandas(reduced, preserve_index=False),
                   str(tmp_path / "reduced.parquet"))

    idx_a = str(tmp_path / "idx_a")
    idx_b = str(tmp_path / "idx_b")
    for src, idx in (("full.parquet", idx_a), ("reduced.parquet", idx_b)):
        out = _run(["build", "--input", str(tmp_path / src),
                    "--index-dir", idx, "--positions"])
        assert out.returncode == 0, out.stderr[-2000:]

    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"doc_id": dead_ids}),
                             preserve_index=False),
        str(tmp_path / "del.parquet"),
    )
    out = _run(["delete", "--index-dir", idx_a,
                "--ids", str(tmp_path / "del.parquet")])
    assert out.returncode == 0, out.stderr[-2000:]
    out = _run(["compact", "--index-dir", idx_a])
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["compacted"] and info["removed"] == len(dead_ids)
    assert info["n_docs"] == 300 - len(dead_ids)
    assert not os.path.isdir(os.path.join(idx_a, "tombstones"))

    # ---- ranked serving: compacted == reindexed (scores included) ----
    q = gen_queries(pdf, n_queries=6, k=5, seed=72)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp_path / "q.parquet"))
    res = {}
    for idx, tag in ((idx_a, "a"), (idx_b, "b")):
        out = _run(["query", "--index-dir", idx,
                    "--queries", str(tmp_path / "q.parquet"),
                    "--out", str(tmp_path / f"res_{tag}")])
        assert out.returncode == 0, out.stderr[-2000:]
        res[tag] = _read_dir(tmp_path / f"res_{tag}").sort_values(
            ["query_id", "rank"]
        ).reset_index(drop=True)
    a, b = res["a"], res["b"]
    assert len(a) == len(b) and len(a) > 0
    mapped = fresh_to_orig[b["doc_id"].to_numpy(np.int64)]
    assert (a["doc_id"].to_numpy(np.int64) == mapped).all()
    assert np.allclose(a["bm25"], b["bm25"], atol=1e-9)
    assert not (set(a["doc_id"]) & set(dead_ids))

    # ---- positional serving: compacted phrase store == reindexed ----
    toks = reduced["text"].str.lower().str.split()
    ph = next(
        " ".join(t[:2]) for t in toks if len(t) >= 2
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"query_id": [0], "text": [ph]}),
            preserve_index=False,
        ),
        str(tmp_path / "pq.parquet"),
    )
    pres = {}
    for idx, tag in ((idx_a, "a"), (idx_b, "b")):
        out = _run(["query", "--index-dir", idx, "--mode", "phrase",
                    "--queries", str(tmp_path / "pq.parquet"),
                    "--out", str(tmp_path / f"pres_{tag}")])
        assert out.returncode == 0, out.stderr[-2000:]
        pres[tag] = _read_dir(tmp_path / f"pres_{tag}")
    got_a = set(pres["a"]["doc_id"].astype(np.int64))
    got_b = {int(fresh_to_orig[d]) for d in pres["b"]["doc_id"]}
    assert got_a == got_b and got_a
    assert not (got_a & set(dead_ids))

    # ---- second compact is a no-op ----
    out = _run(["compact", "--index-dir", idx_a])
    assert out.returncode == 0
    assert json.loads(out.stdout.strip().splitlines()[-1]) == {
        "compacted": False, "reason": "no tombstones"
    }


def test_compact_refuses_streaming_layout(tmp_path):
    os.makedirs(tmp_path / "sidx")
    (tmp_path / "sidx" / "stream_manifest.json").write_text("{}")
    out = _run(["compact", "--index-dir", str(tmp_path / "sidx")])
    assert out.returncode == 2
    assert json.loads(out.stderr.strip().splitlines()[-1])["error"] == (
        "not a batch index"
    )
