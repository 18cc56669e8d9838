"""Live-docs deletes (operators/deletes.py + CLI `delete`).

The exactness claims under test:

 * WAND in-kernel exclusion returns exactly the deep ranking minus the
   tombstoned docs (threshold soundness — dropping candidates before
   the threshold rises never prunes a live doc);
 * the over-retrieve+trim wrapper (k+T → anti-filter → renumber) gives
   the SAME answer as in-kernel exclusion, across topologies;
 * the DSL executor's matched sets lose exactly the tombstoned docs;
 * the CLI lifecycle: delete → every topology serves identical,
   tombstone-free, k-filled results.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nil_spark.plans import entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"),
         "--master", "local[2]", "--shuffle-partitions", "4", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


def test_wand_excluded_equals_deep_ranking_minus_tombstones(spark):
    from nil_spark.operators.wand import topk_replica_bmw

    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, SF_DIR
    )
    qpdf = pd.DataFrame(
        {"query_id": [0, 1], "k": [50, 50],
         "text": ["hash join merge", "dup table scan"]}
    )
    deep = (
        topk_replica_bmw(spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg)
        .toPandas().sort_values(["query_id", "rank"])
    )
    # tombstone each query's rank-1 and rank-3 docs
    tombs = np.unique(np.concatenate([
        deep[deep.query_id == q].iloc[[0, 2]]["doc_id"].to_numpy(np.int64)
        for q in (0, 1)
    ]))

    qk = qpdf.assign(k=5)
    got = (
        topk_replica_bmw(
            spark, qk, shard_paths, td_pdf, n_docs, avgdl, cfg,
            excluded=tombs,
        )
        .toPandas().sort_values(["query_id", "rank"])
    )
    for q in (0, 1):
        exp = [
            (d, s)
            for d, s in zip(
                deep[deep.query_id == q]["doc_id"],
                deep[deep.query_id == q]["bm25"],
            )
            if d not in set(tombs.tolist())
        ][:5]
        g = list(zip(got[got.query_id == q]["doc_id"],
                     got[got.query_id == q]["bm25"]))
        assert g == exp, (q, g, exp)


def test_exclude_and_trim_matches_in_kernel(spark):
    """Over-retrieve+trim (the generic wrapper) must agree with WAND's
    in-kernel exclusion — the two delete strategies are interchangeable."""
    from nil_spark.operators.deletes import exclude_and_trim
    from nil_spark.operators.wand import topk_replica_bmw

    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, SF_DIR
    )
    qpdf = pd.DataFrame(
        {"query_id": [0], "k": [8], "text": ["the fast query scan"]}
    )
    base = topk_replica_bmw(
        spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg
    ).toPandas()
    tombs = np.sort(base["doc_id"].to_numpy(np.int64)[[0, 4]])

    in_kernel = (
        topk_replica_bmw(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg,
            excluded=tombs,
        ).toPandas().sort_values("rank").reset_index(drop=True)
    )
    over = topk_replica_bmw(
        spark, qpdf.assign(k=8 + len(tombs)), shard_paths, td_pdf,
        n_docs, avgdl, cfg,
    )
    trimmed = (
        exclude_and_trim(over, tombs, 8)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert trimmed[["query_id", "rank", "doc_id"]].equals(
        in_kernel[["query_id", "rank", "doc_id"]]
    )
    assert np.allclose(trimmed["bm25"], in_kernel["bm25"])


def test_dsl_excluded_drops_exactly_tombstones(spark):
    from nil_spark.operators.dsl_exec import dsl_search_replica

    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, SF_DIR
    )
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["hash AND join"]})
    full = dsl_search_replica(
        spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg, k=n_docs
    ).toPandas()
    tombs = np.sort(full["doc_id"].to_numpy(np.int64)[:3])
    got = dsl_search_replica(
        spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg, k=n_docs,
        excluded=tombs,
    ).toPandas()
    assert set(got["doc_id"]) == set(full["doc_id"]) - set(tombs.tolist())


def test_cli_delete_lifecycle(tmp_path):
    from nil_spark.sources.transcripts import gen_queries, gen_transcripts

    pdf = gen_transcripts(300, seed=51)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "corpus.parquet"),
    )
    idx_dir = str(tmp_path / "idx")
    out = _run(["build", "--input", str(tmp_path / "corpus.parquet"),
                "--index-dir", idx_dir])
    assert out.returncode == 0, out.stderr[-2000:]

    q = gen_queries(pdf, n_queries=4, k=5, seed=52)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp_path / "q.parquet"))

    def query(topology: str, tag: str) -> pd.DataFrame:
        out = _run(["query", "--index-dir", idx_dir,
                    "--queries", str(tmp_path / "q.parquet"),
                    "--topology", topology,
                    "--out", str(tmp_path / f"res_{tag}_{topology}")])
        assert out.returncode == 0, out.stderr[-2000:]
        d = tmp_path / f"res_{tag}_{topology}"
        return (
            pd.concat(
                pq.read_table(os.path.join(d, f)).to_pandas()
                for f in os.listdir(d) if f.endswith(".parquet")
            ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        )

    before = query("join", "before")
    # tombstone every query's current top-1 doc
    top1 = before[before["rank"] == 1]["doc_id"].drop_duplicates()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": top1}), preserve_index=False
        ),
        str(tmp_path / "del.parquet"),
    )
    out = _run(["delete", "--index-dir", idx_dir,
                "--ids", str(tmp_path / "del.parquet")])
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])[
        "tombstones_total"
    ] == len(top1)

    dead = set(top1.tolist())
    results = {t: query(t, "after") for t in ("join", "replica", "wand")}
    base = results["join"]
    assert not (set(base["doc_id"]) & dead)
    # k still filled: 5 live results per query
    assert (base.groupby("query_id").size() == 5).all()
    for t in ("replica", "wand"):
        r = results[t]
        assert r[["query_id", "rank", "doc_id"]].equals(
            base[["query_id", "rank", "doc_id"]]
        ), t
        assert np.allclose(r["bm25"], base["bm25"]), t


def test_cli_delete_bad_inputs(tmp_path):
    out = _run(["delete", "--index-dir", str(tmp_path / "nope"),
                "--ids", str(tmp_path / "nope.parquet")])
    assert out.returncode == 2
    assert json.loads(out.stderr.strip().splitlines()[-1])["error"] == (
        "not an index directory"
    )


def test_append_tombstones_rejects_nulls_and_accumulates(spark, tmp_path):
    """A null doc_id would poison the sidecar (every later load crashes
    converting to int64) — refused loudly; and successive delete
    batches accumulate rather than clobber."""
    import pytest

    from nil_spark.operators.deletes import (
        append_tombstones,
        load_tombstones,
    )

    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    with pytest.raises(ValueError, match="null"):
        append_tombstones(
            spark, idx,
            spark.createDataFrame([(1,), (None,)], "doc_id long"),
        )
    assert load_tombstones(spark, idx) is None  # nothing was written

    assert append_tombstones(
        spark, idx, spark.createDataFrame([(1,), (2,)], "doc_id long")
    ) == 2
    assert append_tombstones(
        spark, idx, spark.createDataFrame([(2,), (7,)], "doc_id long")
    ) == 3
    assert load_tombstones(spark, idx).tolist() == [1, 2, 7]


def test_dsl_dense_universe_rejects_out_of_range_ids(spark):
    """A NOT complement in dense mode must refuse when posting ids
    exceed n_docs (foreign/sparse-id index) instead of returning
    phantom docs."""
    import pytest

    from nil_spark.operators.dsl_exec import dsl_search_replica

    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, SF_DIR
    )
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["NOT hash"]})
    with pytest.raises(Exception, match="not dense"):
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, 3, avgdl, cfg, k=5
        ).collect()


def test_cli_query_stream_excludes_tombstones(tmp_path):
    """The streaming serving surface must agree with batch serving
    about which docs exist (regression: query-stream initially missed
    the tombstone wiring)."""
    from nil_spark.sources.transcripts import gen_queries, gen_transcripts

    pdf = gen_transcripts(250, seed=61)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "corpus.parquet"),
    )
    idx_dir = str(tmp_path / "idx")
    out = _run(["build", "--input", str(tmp_path / "corpus.parquet"),
                "--index-dir", idx_dir])
    assert out.returncode == 0, out.stderr[-2000:]

    q = gen_queries(pdf, n_queries=3, k=5, seed=62)
    qdir = tmp_path / "qstream"
    os.makedirs(qdir)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(qdir / "batch0.parquet"))

    # baseline batch query → tombstone every top-1 doc → query-stream
    out = _run(["query", "--index-dir", idx_dir,
                "--queries", str(qdir / "batch0.parquet"),
                "--out", str(tmp_path / "base")])
    assert out.returncode == 0, out.stderr[-2000:]
    base = pd.concat(
        pq.read_table(os.path.join(tmp_path / "base", f)).to_pandas()
        for f in os.listdir(tmp_path / "base") if f.endswith(".parquet")
    )
    dead = base[base["rank"] == 1]["doc_id"].drop_duplicates()
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"doc_id": dead}),
                             preserve_index=False),
        str(tmp_path / "del.parquet"),
    )
    out = _run(["delete", "--index-dir", idx_dir,
                "--ids", str(tmp_path / "del.parquet")])
    assert out.returncode == 0, out.stderr[-2000:]

    out = _run(["query-stream", "--index-dir", idx_dir,
                "--queries-dir", str(qdir), "--out", str(tmp_path / "sres")])
    assert out.returncode == 0, out.stderr[-2000:]
    import glob as _glob

    got = pd.concat(
        pq.read_table(f).to_pandas()
        for f in _glob.glob(str(tmp_path / "sres" / "batch_id=*" / "*.parquet"))
    )
    assert not (set(got["doc_id"]) & set(dead.tolist()))
    assert (got.groupby("query_id").size() == 5).all()
