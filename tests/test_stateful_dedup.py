"""applyInPandasWithState streaming exact-dedup: cross-batch state,
deterministic canonical assignment, agreement with the batch operator."""

from __future__ import annotations

import os

import pandas as pd

import hashlib

import numpy as np

from nil_spark.operators.dedup import exact_dedup
from nil_spark.streaming.stateful_dedup import (
    _dedup_fn_factory,
    streaming_exact_dedup,
)


def test_streaming_dedup_matches_batch(spark, transcripts_1k, tmp_path):
    docs = (
        transcripts_1k.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)[["text"]]
        .assign(doc_id=lambda d: d.index.astype("int64"))[["doc_id", "text"]]
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    half = len(docs) // 2
    ck, out_dir = str(tmp_path / "ck"), str(tmp_path / "out")
    # two arrivals in ascending doc_id order; the second must dedup
    # against state built by the first (cross-batch duplicates exist:
    # the generator plants ~2% exact copies of EARLIER turns)
    for i, part in enumerate((docs.iloc[:half], docs.iloc[half:])):
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(in_dir, f"arrival{i}")
        )
        streaming_exact_dedup(spark, in_dir + "/arrival*", ck, out_dir)

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(docs)

    batch = (
        exact_dedup(spark.createDataFrame(docs))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["canon_id"].values == batch["canon_id"].values).all()
    assert (got["is_dup"].values == (batch["doc_id"] != batch["canon_id"]).values).all()
    assert got["is_dup"].any(), "fixture must contain exact duplicates"
    # cross-batch dedup actually exercised: some dup in the second half
    # has its canonical doc in the first half
    second = got[got["doc_id"] >= half]
    assert (second["is_dup"] & (second["canon_id"] < half)).any()


def test_streaming_dedup_with_ttl_matches_batch(spark, transcripts_1k, tmp_path):
    """Multi-batch run with eviction ON (window larger than the run):
    results must still match the batch operator exactly."""
    docs = (
        transcripts_1k.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)[["text"]]
        .assign(doc_id=lambda d: d.index.astype("int64"))[["doc_id", "text"]]
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    third = len(docs) // 3
    ck, out_dir = str(tmp_path / "ck"), str(tmp_path / "out")
    cuts = (docs.iloc[:third], docs.iloc[third : 2 * third], docs.iloc[2 * third :])
    for i, part in enumerate(cuts):
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(in_dir, f"arrival{i}")
        )
        streaming_exact_dedup(spark, in_dir + "/arrival*", ck, out_dir, ttl_batches=100)
    got = spark.read.parquet(out_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    batch = exact_dedup(spark.createDataFrame(docs)).toPandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert len(got) == len(docs)
    assert (got["canon_id"].values == batch["canon_id"].values).all()


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the dedup kernel."""

    def __init__(self):
        self.exists = False
        self._tuple = None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t
        self.exists = True


def _run_batch(fn, state, rows):
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
            "text": [r[1] for r in rows],
        }
    )
    pdf["h"] = [hashlib.md5(t.encode()).hexdigest() for t in pdf["text"]]
    return pd.concat(list(fn(("00",), iter([pdf]), state)), ignore_index=True)


def test_ttl_evicts_stale_entries():
    """An entry unseen for > ttl_batches is evicted: its hash re-arriving
    later is tagged canonical again (windowed-dedup semantics), while
    ttl=None keeps the unbounded exact behavior."""
    fn = _dedup_fn_factory(ttl_batches=0)
    st = _FakeState()
    _run_batch(fn, st, [(0, "x")])
    _run_batch(fn, st, [(1, "y")])  # 'x' unseen this batch -> evicted
    out = _run_batch(fn, st, [(2, "x")])
    assert not out["is_dup"].iloc[0] and out["canon_id"].iloc[0] == 2

    fn2 = _dedup_fn_factory(ttl_batches=None)
    st2 = _FakeState()
    _run_batch(fn2, st2, [(0, "x")])
    _run_batch(fn2, st2, [(1, "y")])
    out2 = _run_batch(fn2, st2, [(2, "x")])
    assert out2["is_dup"].iloc[0] and out2["canon_id"].iloc[0] == 0


def test_state_size_bounded_under_replayed_duplicates():
    """Replaying the same documents must not grow the state: columnar
    blobs stay the same size batch after batch (32 B per unique hash)."""
    fn = _dedup_fn_factory(ttl_batches=None)
    st = _FakeState()
    rows = [(i, f"doc {i % 5}") for i in range(50)]  # 5 unique texts
    _run_batch(fn, st, rows)
    size_after_first = sum(len(b) for b in st.get[:4])
    assert len(st.get[0]) == 5 * 8  # 5 unique hashes, u64 hi key
    for _ in range(10):
        _run_batch(fn, st, rows)
    assert sum(len(b) for b in st.get[:4]) == size_after_first


def test_dedup_kernel_within_and_cross_batch():
    """Within-batch firsts by ascending doc_id, cross-batch canon from
    state, TTL refresh on hit."""
    fn = _dedup_fn_factory(ttl_batches=1)
    st = _FakeState()
    out = _run_batch(fn, st, [(3, "a"), (1, "a"), (2, "b")])
    out = out.set_index("doc_id")
    assert not out.loc[1, "is_dup"] and out.loc[3, "is_dup"]
    assert out.loc[3, "canon_id"] == 1
    # hit refreshes TTL: 'a' seen again in batch 1, so survives into 2
    out = _run_batch(fn, st, [(4, "a")])
    assert out["is_dup"].iloc[0] and out["canon_id"].iloc[0] == 1
    out = _run_batch(fn, st, [(5, "c")])  # 'a' unseen (within ttl=1)
    out = _run_batch(fn, st, [(6, "a")])  # still within window -> dup
    assert out["is_dup"].iloc[0] and out["canon_id"].iloc[0] == 1
