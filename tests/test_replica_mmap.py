"""Node-shared mmap replica store: the first loader publishes flat
``.npy`` arrays; later loads (fresh worker cohorts) mmap the published
files instead of re-decoding the shards.  Guards the serving-path fix
for worker-pool churn: a cohort of Python workers that never served
this index before must NOT pay a full decode each."""

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    _build_replica_arrays,
    _load_replica,
    _replica_store_dir,
    _REPLICA_CACHE,
    build_partial_segments,
)
from nil_spark.config import EngineConfig
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA

CFG = EngineConfig(gram_size=1, num_segments=4, block_size=16)


@pytest.fixture(scope="module")
def shard_paths(spark, transcripts_1k, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mmap_shards") / "shards")
    docs = assign_doc_ids(
        spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=4,
    )
    build_partial_segments(docs.repartition(4), CFG).write.parquet(d)
    raw = spark.read.parquet(d)
    st = (
        raw.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s"))
        .collect()[0]
    )
    avgdl = float(st["s"]) / int(st["n"])
    return tuple(sorted(glob.glob(d + "/part-*.parquet"))), avgdl


def test_publish_then_mmap_load(shard_paths, tmp_path, monkeypatch):
    paths, avgdl = shard_paths
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    k1, b = CFG.bm25_k1, CFG.bm25_b

    _REPLICA_CACHE.clear()
    v1 = _load_replica(paths, avgdl, k1, b)  # publisher
    key = (paths, round(avgdl, 9), k1, b)
    store = _replica_store_dir(key, paths)
    assert os.path.exists(os.path.join(store, "DONE"))
    for n in ("terms", "offs", "docs", "tfn"):
        assert os.path.exists(os.path.join(store, n + ".npy"))

    # fresh "worker": in-process cache emptied -> must take the mmap
    # path (arrays are memmaps), and must agree with a direct build
    _REPLICA_CACHE.clear()
    v2 = _load_replica(paths, avgdl, k1, b)
    assert isinstance(v2.docs, np.memmap)
    ref_terms, ref_offs, ref_docs, ref_tfn = _build_replica_arrays(paths, avgdl, k1, b)
    np.testing.assert_array_equal(np.asarray(v2.terms), ref_terms)
    np.testing.assert_array_equal(np.asarray(v2.offs), ref_offs)
    np.testing.assert_array_equal(np.asarray(v2.docs), ref_docs)
    np.testing.assert_allclose(np.asarray(v2.tfn), ref_tfn)

    # view lookup semantics: every term present, absent term -> None
    for i, t in enumerate(ref_terms[:50]):
        d, c = v2.get(int(t))
        np.testing.assert_array_equal(np.asarray(d), ref_docs[ref_offs[i]:ref_offs[i + 1]])
    missing = int(ref_terms.max()) + 1
    assert v2.get(missing) is None and missing not in v2
    assert v1.get(int(ref_terms[0]))[0].shape == v2.get(int(ref_terms[0]))[0].shape

    # third load: in-process cache hit returns the same view object
    assert _load_replica(paths, avgdl, k1, b) is v2


def test_store_fingerprint_tracks_content(shard_paths, tmp_path):
    paths, avgdl = shard_paths
    key = (paths, round(avgdl, 9), CFG.bm25_k1, CFG.bm25_b)
    d1 = _replica_store_dir(key, paths)
    # different scoring constants -> different store
    d2 = _replica_store_dir((paths, round(avgdl, 9), 0.5, 0.1), paths)
    assert d1 != d2


def _race_load(args):
    import numpy as np

    from nil_spark.operators import segments as seg

    paths, avgdl, k1, b, store_dir, probe_terms = args
    import os

    os.environ["NIL_REPLICA_DIR"] = store_dir
    seg._REPLICA_CACHE.clear()
    v = seg._load_replica(paths, avgdl, k1, b)
    out = []
    for t in probe_terms:
        e = v.get(int(t))
        out.append((int(t), len(e[0]) if e is not None else -1,
                    float(np.sum(e[1])) if e is not None else 0.0))
    return out


def test_concurrent_cold_load_single_publish(shard_paths, tmp_path):
    """8 processes race a cold store: exactly one publishes, everyone
    returns identical postings (the mkdir-lock + DONE-wait path)."""
    import multiprocessing as mp

    paths, avgdl = shard_paths
    k1, b = CFG.bm25_k1, CFG.bm25_b
    ref_terms, ref_offs, ref_docs, ref_tfn = _build_replica_arrays(paths, avgdl, k1, b)
    probe = [int(t) for t in ref_terms[:: max(1, len(ref_terms) // 20)]]
    args = (paths, avgdl, k1, b, str(tmp_path), probe)
    with mp.get_context("spawn").Pool(8) as pool:
        results = pool.map(_race_load, [args] * 8)
    assert all(r == results[0] for r in results)
    for (t, n, s), i in zip(results[0], range(0, len(ref_terms), max(1, len(ref_terms) // 20))):
        assert n == int(ref_offs[i + 1] - ref_offs[i])
        assert abs(s - float(np.sum(ref_tfn[ref_offs[i]:ref_offs[i + 1]]))) < 1e-6
    # exactly one store dir, fully published
    stores = [d for d in os.listdir(tmp_path) if d.startswith("nil_replica_")]
    assert len(stores) == 1 and not any(d.endswith(".lock") for d in os.listdir(tmp_path))
    assert os.path.exists(os.path.join(tmp_path, stores[0], "DONE"))


def test_merge_flat_shards_matches_dict_reference():
    """The vectorized k-way scatter merge must agree with a brute-force
    dict merge (term-sorted output, per-term postings in canonical doc
    order — the searchsorted serving paths require it) on random shard
    layouts, including empty shards, terms present in only some shards,
    and interleaved shard doc-ranges."""
    import random

    rng = random.Random(11)
    for trial in range(5):
        flats = []
        expect: dict[int, list] = {}
        n_shards = rng.randint(1, 5)
        for s in range(n_shards):
            terms = sorted(rng.sample(range(40), rng.randint(0, 12)))
            docs_parts, tfn_parts, counts = [], [], []
            for t in terms:
                k = rng.randint(1, 4)
                dv = np.array([s * 1000 + rng.randint(0, 99) for _ in range(k)], np.int64)
                cv = np.round(np.random.default_rng(s * 100 + t).random(k), 6)
                docs_parts.append(dv)
                tfn_parts.append(cv)
                counts.append(k)
                expect.setdefault(t, []).append((dv, cv))
            offs = np.zeros(len(terms) + 1, np.int64)
            np.cumsum(counts, out=offs[1:])
            flats.append(
                (
                    np.array(terms, np.int64),
                    offs,
                    np.concatenate(docs_parts) if docs_parts else np.empty(0, np.int64),
                    np.concatenate(tfn_parts) if tfn_parts else np.empty(0, np.float64),
                )
            )
        from nil_spark.operators.segments import _merge_flat_shards

        gterms, goffs, docs, tfn = _merge_flat_shards(flats)
        exp_terms = np.array(sorted(expect), np.int64)
        np.testing.assert_array_equal(gterms, exp_terms)
        for i, t in enumerate(exp_terms):
            ed = np.concatenate([d for d, _ in expect[t]])
            ec = np.concatenate([c for _, c in expect[t]])
            # canonical per-term doc order; stable, so equal doc ids
            # keep shard order
            o = np.argsort(ed, kind="stable")
            np.testing.assert_array_equal(docs[goffs[i]:goffs[i + 1]], ed[o])
            np.testing.assert_allclose(tfn[goffs[i]:goffs[i + 1]], ec[o])


def test_publish_replica_at_build(spark, shard_paths, tmp_path, monkeypatch):
    """publish_replica (parallel Spark decode stage + vectorized merge)
    must produce a store byte-identical to the serving-side lazy build,
    under the SAME key — so the first query batch after a published
    build attaches via mmap with zero decode."""
    from nil_spark.operators.segments import publish_replica

    paths, avgdl = shard_paths
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    k1, b = CFG.bm25_k1, CFG.bm25_b
    store = publish_replica(list(paths), avgdl, CFG, spark=spark)
    assert os.path.exists(os.path.join(store, "DONE"))
    # flat dumps cleaned, only the 4 merged arrays remain
    assert sorted(f for f in os.listdir(store) if f.endswith(".npy")) == sorted(
        n + ".npy" for n in ("terms", "offs", "docs", "tfn")
    )
    # the serving path must attach to THIS store (same key): mmap views
    _REPLICA_CACHE.clear()
    v = _load_replica(tuple(sorted(paths)), avgdl, k1, b)
    assert isinstance(v.docs, np.memmap)
    ref = _build_replica_arrays(tuple(sorted(paths)), avgdl, k1, b)
    np.testing.assert_array_equal(np.asarray(v.terms), ref[0])
    np.testing.assert_array_equal(np.asarray(v.offs), ref[1])
    np.testing.assert_array_equal(np.asarray(v.docs), ref[2])
    np.testing.assert_allclose(np.asarray(v.tfn), ref[3])
    # idempotent second call: returns immediately (DONE short-circuit)
    assert publish_replica(list(paths), avgdl, CFG, spark=spark) == store


def test_lock_steal_release_is_owner_only(shard_paths, tmp_path, monkeypatch):
    """A publisher that outlives the publish deadline has its lock
    stolen by a healer.  Its finally-release must NOT remove the
    healer's lock (the old unconditional rmdir did — and the healer's
    own release then raised FileNotFoundError after a successful
    publish)."""
    from nil_spark.operators.segments import _published_arrays

    paths, avgdl = shard_paths
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    k1, b = CFG.bm25_k1, CFG.bm25_b
    key = (paths, round(avgdl, 9), k1, b)
    store = _replica_store_dir(key, paths)
    lock, owner = store + ".lock", store + ".lock.owner"

    def slow_build():
        arrays = _build_replica_arrays(paths, avgdl, k1, b)
        # simulate a healer stealing the lock mid-publish: new owner token
        with open(owner, "w") as f:
            f.write("healer-token")
        return arrays

    _REPLICA_CACHE.clear()
    _published_arrays(key, paths, slow_build)
    # the stolen lock belongs to the healer now — left intact
    assert os.path.exists(lock)
    with open(owner) as f:
        assert f.read() == "healer-token"
    os.remove(owner)
    os.rmdir(lock)


def test_stale_lock_healed(shard_paths, tmp_path, monkeypatch):
    """A lock dir left by a hard-killed publisher (mtime older than the
    publish deadline) must be healed: the next loader retakes the lock
    and publishes instead of falling back to a private build forever."""
    import time as _time

    from nil_spark.operators.segments import _REPLICA_CACHE as cache

    paths, avgdl = shard_paths
    monkeypatch.setenv("NIL_REPLICA_DIR", str(tmp_path))
    monkeypatch.setenv("NIL_REPLICA_PUBLISH_TIMEOUT", "1")
    k1, b = CFG.bm25_k1, CFG.bm25_b
    key = (paths, round(avgdl, 9), k1, b)
    store = _replica_store_dir(key, paths)
    lock = store + ".lock"
    os.mkdir(lock)
    old = _time.time() - 60
    os.utime(lock, (old, old))

    cache.clear()
    v = _load_replica(paths, avgdl, k1, b)
    assert os.path.exists(os.path.join(store, "DONE"))  # published, not private
    assert not os.path.exists(lock)
    ref_terms, _, _, _ = _build_replica_arrays(paths, avgdl, k1, b)
    assert v.get(int(ref_terms[0])) is not None
