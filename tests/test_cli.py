"""spark-submit surface end-to-end: build (fused checkpointed path) then
query via the cli in subprocesses (fresh JVMs, as spark-submit would),
rank-identical to the oracle; config-fingerprint drift fails fast."""

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
from nil_spark.sources.transcripts import gen_queries, gen_transcripts
from nil_spark.testing.oracle import OracleIndex

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list, env: dict | None = None) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"), "--master", "local[2]",
         "--shuffle-partitions", "4", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env={**os.environ, **env} if env else None,
    )


@pytest.fixture(scope="module")
def cli_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    pdf = gen_transcripts(400, seed=21)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), str(tmp / "corpus.parquet")
    )
    idx_dir = str(tmp / "idx")
    out = _run(["build", "--input", str(tmp / "corpus.parquet"),
                "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 400
    return tmp, idx_dir, pdf


def test_cli_build_and_query(cli_index):
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=8, k=5, seed=22)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), str(tmp / "q.parquet"))
    out = _run(["query", "--index-dir", idx_dir,
                "--queries", str(tmp / "q.parquet"), "--out", str(tmp / "res")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp / "res", f)).to_pandas()
            for f in os.listdir(tmp / "res")
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_cli_fingerprint_mismatch_fails_fast(cli_index):
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=2, k=3, seed=23)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), str(tmp / "q2.parquet"))
    out = _run(["--gram-size", "3", "query", "--index-dir", idx_dir,
                "--queries", str(tmp / "q2.parquet"), "--out", str(tmp / "res2")])
    assert out.returncode == 2, out.stdout[-1500:] + out.stderr[-1500:]
    assert "config mismatch" in out.stderr


@pytest.mark.parametrize("topology", ["replica", "wand", "sharded", "term_sharded"])
def test_cli_query_topologies_rank_identical(cli_index, topology):
    """--topology replica/sharded must return the same ranks as the
    join path and the oracle (fresh JVM, as spark-submit would)."""
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=6, k=5, seed=24)
    qp = str(tmp / f"q_{topology}.parquet")
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), qp)
    res = str(tmp / f"res_{topology}")
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp,
                "--out", res, "--topology", topology])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle), topology
    assert (got["doc_id"].values == oracle["doc_id"].values).all(), topology
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_cli_termdict_guard_auto_switch(cli_index):
    """A vocabulary over the driver-resident bound (forced tiny via
    NIL_TERMDICT_DRIVER_MAX) AUTO-SWITCHES --topology replica to the
    join topology — same rank-identical results, warning on stderr —
    instead of collecting an unbounded dictionary (round-4 verdict
    'What's wrong #3')."""
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=4, k=5, seed=27)
    qp = str(tmp / "q_guard.parquet")
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), qp)
    res = str(tmp / "res_guard")
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp,
                "--out", res, "--topology", "replica"],
               env={"NIL_TERMDICT_DRIVER_MAX": "3"})
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    warn = [
        json.loads(ln) for ln in out.stderr.splitlines()
        if ln.startswith("{") and "warning" in ln
    ]
    assert any("auto-switching" in w.get("warning", "") for w in warn), (
        out.stderr[-2000:]
    )
    got = (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()


def test_cli_termdict_guard_pinned_feature_refuses(cli_index):
    """When a topology-pinned feature (--explain) is requested and the
    dictionary is over the bound, the CLI refuses with a structured
    error instead of silently dropping the feature or OOMing."""
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=2, k=3, seed=28)
    qp = str(tmp / "q_guard2.parquet")
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), qp)
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp,
                "--out", str(tmp / "res_guard2"), "--topology", "replica",
                "--explain"],
               env={"NIL_TERMDICT_DRIVER_MAX": "3"})
    assert out.returncode == 2, out.stdout[-2000:] + out.stderr[-2000:]
    errs = [
        json.loads(ln) for ln in out.stderr.splitlines()
        if ln.startswith("{") and "error" in ln
    ]
    assert any("termdict too large" in e.get("error", "") for e in errs), (
        out.stderr[-2000:]
    )


def test_cli_publish_replica_at_build(tmp_path, monkeypatch):
    """build --publish-replica must leave a completed mmap store that a
    LATER query process (fresh JVM) attaches to without re-publishing —
    rank-identical results, store mtimes untouched by the query."""
    import glob

    pdf = gen_transcripts(300, seed=31)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), str(tmp_path / "corpus.parquet")
    )
    idx_dir = str(tmp_path / "idx")
    store_base = str(tmp_path / "replica_store")
    os.makedirs(store_base)
    env = {**os.environ, "NIL_REPLICA_DIR": store_base}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"), "--master", "local[2]",
         "--shuffle-partitions", "4", "build", "--input",
         str(tmp_path / "corpus.parquet"), "--index-dir", idx_dir,
         "--publish-replica"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    store = info["replica_store"]
    assert os.path.exists(os.path.join(store, "DONE"))
    mtimes = {
        f: os.path.getmtime(os.path.join(store, f)) for f in os.listdir(store)
    }

    q = gen_queries(pdf, n_queries=5, k=5, seed=32)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), str(tmp_path / "q.parquet"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"), "--master", "local[2]",
         "--shuffle-partitions", "4", "query", "--index-dir", idx_dir,
         "--queries", str(tmp_path / "q.parquet"), "--out", str(tmp_path / "res"),
         "--topology", "replica"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    # query attached to the published store: no new store dir appeared
    # and the published files were not rewritten
    stores = glob.glob(os.path.join(store_base, "nil_replica_*"))
    assert stores == [store]
    assert {
        f: os.path.getmtime(os.path.join(store, f)) for f in os.listdir(store)
    } == mtimes
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp_path / "res", f)).to_pandas()
            for f in os.listdir(tmp_path / "res")
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_cli_build_from_csv_json_sources(tmp_path, fmt):
    """--format csv/json (the reference's own on-disk model is CSV):
    schema-applied read -> build -> query, rank-identical to the
    oracle."""
    pdf = gen_transcripts(200, seed=31)
    src = str(tmp_path / f"corpus_{fmt}")
    os.makedirs(src)
    if fmt == "csv":
        out_pdf = pdf.copy()
        out_pdf["ts"] = out_pdf["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S")
        out_pdf.to_csv(os.path.join(src, "part0.csv"), index=False)
    else:
        out_pdf = pdf.copy()
        out_pdf["ts"] = out_pdf["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S")
        out_pdf.to_json(
            os.path.join(src, "part0.json"), orient="records", lines=True
        )
    idx_dir = str(tmp_path / "idx")
    out = _run(["build", "--input", src, "--format", fmt, "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 200

    q = gen_queries(pdf, n_queries=5, k=4, seed=32)
    qp = str(tmp_path / "q.parquet")
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), qp)
    res = str(tmp_path / "res")
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp, "--out", res])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_cli_query_stream(cli_index):
    """query-stream: two query files -> two exactly-once batches whose
    union is rank-identical to the oracle."""
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=10, k=5, seed=33)
    qdir = tmp / "qstream"
    qdir.mkdir(exist_ok=True)
    for i, chunk in enumerate((q.iloc[:5], q.iloc[5:])):
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            str(qdir / f"queries-{i}.parquet"),
        )
    out_dir = str(tmp / "stream_res")
    out = _run(["query-stream", "--index-dir", idx_dir,
                "--queries-dir", str(qdir), "--out", out_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["batches"] == 2 and info["queries"] == 10

    parts = []
    for root, _dirs, files in os.walk(out_dir):
        parts += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    got = (
        pd.concat(pq.read_table(p).to_pandas() for p in parts)
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)

    # second drain over the same dir: checkpoint skips, nothing re-answered
    out2 = _run(["query-stream", "--index-dir", idx_dir,
                 "--queries-dir", str(qdir), "--out", out_dir])
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-2000:]
    info2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert info2["batches"] == 2 and info2["queries"] == 10


def test_cli_build_stream_compact_query(tmp_path):
    """Full streaming lifecycle through the CLI: build-stream (two
    micro-batches, in (conv_id, turn_idx) order so batch parity holds)
    -> compact -> query --layout streaming, rank-identical to the
    oracle."""
    pdf = (
        gen_transcripts(400, seed=27)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    half = len(pdf) // 2
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        fp = str(in_dir / f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), fp)
        # FileStreamSource orders batches by mtime; two writes in the
        # same timestamp tick would make batch order (and doc_ids)
        # nondeterministic — pin it explicitly
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))
    idx_dir = str(tmp_path / "sidx")
    out = _run(["build-stream", "--input", str(in_dir),
                "--index-dir", idx_dir, "--compact"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["batches"] == 2 and info["n_docs"] == 400
    assert info["compact"]["compacted_gen"] == 1

    q = gen_queries(pdf, n_queries=8, k=5, seed=28)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp_path / "q.parquet"))
    out = _run(["query", "--layout", "streaming", "--index-dir", idx_dir,
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "res")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp_path / "res", f)).to_pandas()
            for f in os.listdir(tmp_path / "res")
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)

    # --filter-docs on a streaming layout: refused, not silently ignored
    allowed = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(allowed, preserve_index=False),
                   str(tmp_path / "allowed.parquet"))
    out = _run(["query", "--layout", "streaming", "--index-dir", idx_dir,
                "--filter-docs", str(tmp_path / "allowed.parquet"),
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "fres")])
    assert out.returncode == 2
    assert "unsupported for streaming layout" in out.stderr


def test_cli_stats(cli_index):
    tmp, idx_dir, pdf = cli_index
    out = _run(["stats", "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 400
    assert info["postings"] > 0 and info["index_bytes"] > 0
    assert info["build_stages"] == ["partial_segments", "termdict", "segments"]
    assert info["config_fingerprint"]


def test_incremental_config_fingerprint_guard(tmp_path):
    """Re-opening a streaming index with a different EngineConfig must
    fail fast, not silently absorb/serve with mismatched tokenization."""
    from nil_spark.streaming.incremental import IncrementalIndexer

    ix = IncrementalIndexer(str(tmp_path / "idx"), EngineConfig(gram_size=1))
    ix._save()
    with pytest.raises(ValueError, match="config mismatch"):
        IncrementalIndexer(str(tmp_path / "idx"), EngineConfig(gram_size=2))


def test_cli_streaming_layout_autodetect_and_stats(tmp_path):
    """A build-stream index is auto-detected by plain `query` (no
    --layout flag) and by `stats`; asking for a non-join topology on it
    fails structurally."""
    pdf = (
        gen_transcripts(200, seed=31)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    fp = str(in_dir / "part-0.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
    idx_dir = str(tmp_path / "sidx")
    out = _run(["build-stream", "--input", str(in_dir), "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    q = gen_queries(pdf, n_queries=4, k=3, seed=32)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp_path / "q.parquet"))
    # no --layout: auto-detected streaming
    out = _run(["query", "--index-dir", idx_dir,
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "res")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["layout"] == "streaming" and info["results"] > 0

    out = _run(["query", "--index-dir", idx_dir, "--topology", "replica",
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "res2")])
    assert out.returncode == 2
    assert "unsupported topology" in out.stderr

    out = _run(["stats", "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["layout"] == "streaming" and info["postings"] > 0
    assert info["n_docs"] == 200 and info["config_fingerprint"]


def test_cli_build_stream_from_iceberg_table(spark, tmp_path):
    """`build-stream --format iceberg`: the index follows the Iceberg
    table — each drain absorbs exactly the snapshots committed since
    the previous one, and the final index is rank-identical to the
    oracle over the whole corpus."""
    from nil_spark.sources.iceberg import write_iceberg
    from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    pdf = (
        gen_transcripts(400, seed=33)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    half = len(pdf) // 2
    tbl = str(tmp_path / "tbl")
    idx_dir = str(tmp_path / "sidx")
    t = write_iceberg(
        spark, spark.createDataFrame(pdf.iloc[:half], schema=TRANSCRIPT_SCHEMA), tbl
    )
    out = _run(["build-stream", "--format", "iceberg", "--input", tbl,
                "--index-dir", idx_dir])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["batches"] == 1 and info["n_docs"] == half

    # second snapshot -> second drain absorbs ONLY the new rows
    t.append(spark, spark.createDataFrame(pdf.iloc[half:], schema=TRANSCRIPT_SCHEMA))
    out = _run(["build-stream", "--format", "iceberg", "--input", tbl,
                "--index-dir", idx_dir, "--compact"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["batches"] == 2 and info["n_docs"] == 400

    q = gen_queries(pdf, n_queries=8, k=5, seed=34)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp_path / "q.parquet"))
    out = _run(["query", "--layout", "streaming", "--index-dir", idx_dir,
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "res")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp_path / "res", f)).to_pandas()
            for f in os.listdir(tmp_path / "res")
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(oracle) > 0
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)


def test_cli_iceberg_maintenance(spark, tmp_path):
    """`cli iceberg --action stats|compact|expire` over an engine-native
    table: inventory, small-file fold, snapshot expiry."""
    from nil_spark.sources.iceberg import write_iceberg
    from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    pdf = gen_transcripts(200, seed=41)
    tbl = str(tmp_path / "tbl")
    t = write_iceberg(
        spark,
        spark.createDataFrame(pdf.iloc[:100], schema=TRANSCRIPT_SCHEMA).repartition(3),
        tbl,
    )
    t.append(spark, spark.createDataFrame(pdf.iloc[100:], schema=TRANSCRIPT_SCHEMA).repartition(3))

    out = _run(["iceberg", "--table", tbl, "--action", "stats"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["snapshots"] == 2 and info["data_files"] >= 2

    out = _run(["iceberg", "--table", tbl, "--action", "compact",
                "--target-files", "1"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["compacted"] and info["data_files"] == 1

    out = _run(["iceberg", "--table", tbl, "--action", "expire",
                "--keep-last", "1"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["expired"] and info["snapshots"] == 1 and info["files_removed"] > 0
    # table still fully readable after maintenance
    from nil_spark.sources.iceberg import IcebergTable

    assert IcebergTable(tbl).scan(spark).count() == 200

    out = _run(["iceberg", "--table", str(tmp_path / "nope"), "--action", "stats"])
    assert out.returncode == 2


def test_cli_csv_swapped_header_fails_loudly(tmp_path):
    """ADVICE r3: with a user-supplied schema Spark maps CSV columns by
    POSITION unless enforceSchema=false.  A CSV whose header order
    differs from the transcript schema must FAIL the build (header
    validated against the schema), not silently misassign role/text."""
    pdf = gen_transcripts(50, seed=35)
    out_pdf = pdf.copy()
    out_pdf["ts"] = out_pdf["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S")
    # swap two columns in the on-disk order
    out_pdf = out_pdf[["conv_id", "turn_idx", "text", "role", "tool", "ts"]]
    src = str(tmp_path / "csv")
    os.makedirs(src)
    out_pdf.to_csv(os.path.join(src, "part0.csv"), index=False)
    out = _run(["build", "--input", src, "--format", "csv",
                "--index-dir", str(tmp_path / "idx")])
    assert out.returncode != 0
    assert "CSV header does not conform" in out.stderr or "header" in out.stderr.lower()


def _read_res(res: str) -> pd.DataFrame:
    return (
        pd.concat(
            pq.read_table(os.path.join(res, f)).to_pandas()
            for f in os.listdir(res)
            if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_cli_query_verified(cli_index):
    """--verify: delta=0 overlap accepts every candidate, so the
    verified top-k must be rank-identical to the plain path (plus sim/
    tier columns); delta=101 rejects everything; two_tier at the
    default threshold returns a subset with sane tiers; --verify
    without --corpus is a structured exit-2."""
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=6, k=5, seed=31)
    qp = str(tmp / "q_verify.parquet")
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False), qp)
    corpus = str(tmp / "corpus.parquet")

    res0 = str(tmp / "res_v0")
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp, "--out", res0,
                "--topology", "wand", "--verify", "overlap", "--delta", "0",
                "--corpus", corpus])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = _read_res(res0)
    assert {"sim", "tier"} <= set(got.columns)
    assert (got["tier"] == "ngram").all()
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(q)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["doc_id"].values == oracle["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, oracle["bm25"].values, atol=1e-6)

    res1 = str(tmp / "res_v101")
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp, "--out", res1,
                "--verify", "overlap", "--delta", "101", "--corpus", corpus])
    assert out.returncode == 0
    assert json.loads(out.stdout.strip().splitlines()[-1])["results"] == 0

    res2 = str(tmp / "res_v2")
    out = _run(["query", "--index-dir", idx_dir, "--queries", qp, "--out", res2,
                "--verify", "two_tier", "--corpus", corpus])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    two = _read_res(res2)
    assert set(two["tier"]) <= {"ngram", "lcs"}
    assert (two["sim"] >= 70).all()  # default delta
    for qid, grp in two.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= 5

    out = _run(["query", "--index-dir", idx_dir, "--queries", qp,
                "--out", str(tmp / "res_v3"), "--verify", "two_tier"])
    assert out.returncode == 2
    assert "corpus" in json.loads(out.stderr.strip().splitlines()[-1])["error"]


@pytest.fixture(scope="module")
def cli_pos_index(tmp_path_factory):
    """An index built WITH the positional side-car store."""
    tmp = tmp_path_factory.mktemp("cli_pos")
    pdf = gen_transcripts(300, seed=31)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), str(tmp / "corpus.parquet")
    )
    idx_dir = str(tmp / "idx")
    out = _run(["build", "--input", str(tmp / "corpus.parquet"),
                "--index-dir", idx_dir, "--positions"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["position_chunks"] > 0
    assert os.path.isdir(os.path.join(idx_dir, "positions"))
    return tmp, idx_dir, pdf


def _docs_in_id_order(pdf):
    """doc_id = 0-based rank under (conv_id, turn_idx) — the CLI's
    assign_doc_ids contract."""
    return (
        pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_cli_phrase_mode(cli_pos_index):
    from nil_spark.functions.tokenize import tokenize_series
    from nil_spark.operators.phrase import count_phrase_hits

    tmp, idx_dir, pdf = cli_pos_index
    ordered = _docs_in_id_order(pdf)
    toks = tokenize_series(ordered["text"], EngineConfig(gram_size=1))
    # pick a bigram that actually occurs so the assertion has teeth
    target = None
    for did, ts in enumerate(toks):
        if len(ts) >= 2:
            target = f"{ts[0]} {ts[1]}"
            break
    assert target is not None
    q = pd.DataFrame({"query_id": [0], "text": [target]})
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "pq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "phrase",
                "--queries", str(tmp / "pq.parquet"), "--out", str(tmp / "pres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp / "pres", f)).to_pandas()
            for f in os.listdir(tmp / "pres") if f.endswith(".parquet")
        )
        .sort_values("doc_id").reset_index(drop=True)
    )
    ph = target.split()
    exp = [
        (0, did, count_phrase_hits(list(ts), ph))
        for did, ts in enumerate(toks)
        if count_phrase_hits(list(ts), ph) >= 1
    ]
    assert len(got) == len(exp) > 0
    assert list(zip(got["doc_id"], got["hits"])) == [(d, h) for _, d, h in exp]


def test_cli_proximity_mode_and_bad_query(cli_pos_index):
    from nil_spark.functions.tokenize import tokenize_series

    tmp, idx_dir, pdf = cli_pos_index
    ordered = _docs_in_id_order(pdf)
    toks = tokenize_series(ordered["text"], EngineConfig(gram_size=1))
    pair = None
    for ts in toks:
        distinct = list(dict.fromkeys(ts))
        if len(distinct) >= 2:
            pair = (distinct[0], distinct[1])
            break
    assert pair is not None
    q = pd.DataFrame({"query_id": [0], "text": [f"{pair[0]} {pair[1]}"]})
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "xq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "proximity",
                "-k", "5",
                "--queries", str(tmp / "xq.parquet"), "--out", str(tmp / "xres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp / "xres", f)).to_pandas()
            for f in os.listdir(tmp / "xres") if f.endswith(".parquet")
        )
        .sort_values("rank").reset_index(drop=True)
    )
    exp = {}
    for did, ts in enumerate(toks):
        pa_ = [p for p, t in enumerate(ts) if t == pair[0]]
        pb_ = [p for p, t in enumerate(ts) if t == pair[1]]
        if pa_ and pb_:
            exp[did] = min(abs(a - b) for a in pa_ for b in pb_)
    top = sorted(exp.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert list(zip(got["doc_id"], got["min_dist"])) == top

    # one distinct term -> structured exit 2, not a traceback
    bad = pd.DataFrame({"query_id": [0], "text": [f"{pair[0]} {pair[0]}"]})
    pq.write_table(pa.Table.from_pandas(bad, preserve_index=False),
                   str(tmp / "bq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "proximity",
                "--queries", str(tmp / "bq.parquet"), "--out", str(tmp / "bres")])
    assert out.returncode == 2
    assert "bad query" in out.stderr


def test_cli_phrase_mode_without_store_fails_structured(cli_index):
    tmp, idx_dir, pdf = cli_index  # built WITHOUT --positions
    q = gen_queries(pdf, n_queries=1, k=3, seed=41)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "npq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "phrase",
                "--queries", str(tmp / "npq.parquet"), "--out", str(tmp / "npres")])
    assert out.returncode == 2
    assert "no positional store" in out.stderr


def test_cli_filtered_wand(cli_index):
    """--filter-docs restricts WAND serving to the admissible set and
    equals the unfiltered answer post-filtered + re-ranked."""
    tmp, idx_dir, pdf = cli_index
    q = gen_queries(pdf, n_queries=6, k=4, seed=42)
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "fq.parquet"))
    allowed = pd.DataFrame({"doc_id": np.arange(0, 400, 2, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(allowed, preserve_index=False),
                   str(tmp / "allowed.parquet"))

    out = _run(["query", "--index-dir", idx_dir, "--topology", "wand",
                "--filter-docs", str(tmp / "allowed.parquet"),
                "--queries", str(tmp / "fq.parquet"), "--out", str(tmp / "fres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp / "fres", f)).to_pandas()
            for f in os.listdir(tmp / "fres") if f.endswith(".parquet")
        )
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert (got["doc_id"] % 2 == 0).all()

    deep = q.copy()
    deep["k"] = 400
    oracle = OracleIndex(pdf, EngineConfig(gram_size=1)).topk_frame(deep)
    oracle = oracle[oracle["doc_id"] % 2 == 0]
    exp_rows = []
    for qid, grp in oracle.groupby("query_id"):
        grp = grp.sort_values(["bm25", "doc_id"], ascending=[False, True]).head(4)
        exp_rows.extend(
            (qid, r, int(row.doc_id), row.bm25)
            for r, row in enumerate(grp.itertuples(), start=1)
        )
    exp = pd.DataFrame(exp_rows, columns=["query_id", "rank", "doc_id", "bm25"])
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert np.allclose(got["bm25"].values, exp["bm25"].values, atol=1e-6)

    # wrong topology -> structured refusal
    out = _run(["query", "--index-dir", idx_dir, "--topology", "replica",
                "--filter-docs", str(tmp / "allowed.parquet"),
                "--queries", str(tmp / "fq.parquet"), "--out", str(tmp / "f2res")])
    assert out.returncode == 2
    assert "filter-docs requires" in out.stderr


def test_cli_stream_positions_phrase_query(tmp_path):
    """Streaming lifecycle WITH positional deltas: build-stream
    --positions then query --mode phrase on the streaming layout,
    matching naive recomputation."""
    from nil_spark.functions.tokenize import tokenize_series
    from nil_spark.operators.phrase import count_phrase_hits

    pdf = (
        gen_transcripts(200, seed=33)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    half = len(pdf) // 2
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        fp = str(in_dir / f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), fp)
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))
    idx_dir = str(tmp_path / "sidx")
    out = _run(["build-stream", "--input", str(in_dir),
                "--index-dir", idx_dir, "--positions"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert os.path.isdir(os.path.join(idx_dir, "positions", "batch_id=0"))

    toks = tokenize_series(pdf["text"], EngineConfig(gram_size=1))
    target = next(
        f"{ts[0]} {ts[1]}" for ts in toks if len(ts) >= 2
    )
    q = pd.DataFrame({"query_id": [0], "text": [target]})
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp_path / "pq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "phrase",
                "--queries", str(tmp_path / "pq.parquet"),
                "--out", str(tmp_path / "pres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp_path / "pres", f)).to_pandas()
            for f in os.listdir(tmp_path / "pres") if f.endswith(".parquet")
        )
        .sort_values("doc_id").reset_index(drop=True)
    )
    ph = target.split()
    exp = [
        (did, count_phrase_hits(list(ts), ph))
        for did, ts in enumerate(toks)
        if count_phrase_hits(list(ts), ph) >= 1
    ]
    assert len(got) == len(exp) > 0
    assert list(zip(got["doc_id"], got["hits"])) == exp


def test_cli_positional_mode_flag_conflicts(cli_pos_index):
    """Ranked-retrieval flags refuse to combine with positional modes
    instead of being silently ignored."""
    tmp, idx_dir, pdf = cli_pos_index
    q = pd.DataFrame({"query_id": [0], "text": ["hash join"]})
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "cq.parquet"))
    allowed = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(allowed, preserve_index=False),
                   str(tmp / "callowed.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "phrase",
                "--filter-docs", str(tmp / "callowed.parquet"),
                "--queries", str(tmp / "cq.parquet"),
                "--out", str(tmp / "cres")])
    assert out.returncode == 2
    assert "unsupported with --mode phrase" in out.stderr


def test_cli_partial_positions_store_refused(cli_index):
    """A positions/ dir without _SUCCESS (build killed mid-write) must
    be refused, not served as an authoritative empty store."""
    tmp, idx_dir, pdf = cli_index
    os.makedirs(os.path.join(idx_dir, "positions"), exist_ok=True)
    q = pd.DataFrame({"query_id": [0], "text": ["hash join"]})
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "ppq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "phrase",
                "--queries", str(tmp / "ppq.parquet"),
                "--out", str(tmp / "ppres")])
    assert out.returncode == 2
    assert "no positional store" in out.stderr


def test_cli_window_mode(cli_pos_index):
    """query --mode window returns minimal-window bounds matching the
    naive all-combination scan."""
    from itertools import product

    from nil_spark.functions.tokenize import tokenize_series

    tmp, idx_dir, pdf = cli_pos_index
    ordered = _docs_in_id_order(pdf)
    toks = tokenize_series(ordered["text"], EngineConfig(gram_size=1))
    terms = None
    for ts in toks:
        distinct = list(dict.fromkeys(ts))
        if len(distinct) >= 3:
            terms = distinct[:3]
            break
    assert terms is not None
    q = pd.DataFrame({"query_id": [0], "text": [" ".join(terms)]})
    pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                   str(tmp / "wq.parquet"))
    out = _run(["query", "--index-dir", idx_dir, "--mode", "window",
                "-k", "5",
                "--queries", str(tmp / "wq.parquet"), "--out", str(tmp / "wres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = (
        pd.concat(
            pq.read_table(os.path.join(tmp / "wres", f)).to_pandas()
            for f in os.listdir(tmp / "wres") if f.endswith(".parquet")
        )
        .sort_values("rank").reset_index(drop=True)
    )
    exp = {}
    for did, ts in enumerate(toks):
        plists = [[p for p, t in enumerate(ts) if t == w] for w in terms]
        if any(not pl for pl in plists):
            continue
        best = None
        for combo in product(*plists):
            wl, st = max(combo) - min(combo), min(combo)
            if best is None or (wl, st) < best:
                best = (wl, st)
        exp[did] = best
    top = sorted(
        ((wl, did, st) for did, (wl, st) in exp.items())
    )[:5]
    assert list(zip(got["doc_id"], got["win_start"], got["win_len"])) == [
        (did, st, wl) for wl, did, st in top
    ]
