"""SimHash kernel tests: dense-matmul and sparse-bincount paths must
agree with each other and with a naive pure-Python reference.

The operator (nil_spark/operators/dedup.py:simhash63) is a zero-shuffle
mapInPandas projection; these tests pin its two internal compute paths
(dense tf-matrix matmul vs per-bit weighted bincount, switched on
``dense_cells``) to identical fingerprints, and pin the pinned-hash math
itself against an independent reference implementation.
"""
from __future__ import annotations

import re

import pandas as pd
import pytest

from nil_spark.functions.hashing import md5_prefix64_py
from nil_spark.operators.dedup import simhash63

_SPLIT = re.compile("[^a-z0-9]+")


def _naive_simhash(text: str) -> int | None:
    toks = [w for w in _SPLIT.split(text.lower()) if w]
    if not toks:
        return None
    sums = [0] * 63
    for t in toks:
        h = md5_prefix64_py(t)
        for b in range(63):
            sums[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(63) if sums[b] > 0)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup
        (3, "completely different content about spark engines"),
        (4, "!!! ...  "),  # zero tokens after tokenization -> excluded
        (5, "singleton"),
        (6, "Mixed CASE and punctuation, should normalize-fine 123"),
        (7, " ".join(f"w{i % 97}" for i in range(3000))),  # long doc, tf > 1
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _collect(df):
    return {r.doc_id: r.simhash for r in df.collect()}


def test_simhash_matches_naive_reference(docs_df):
    got = _collect(simhash63(docs_df))
    want = {
        i: _naive_simhash(t)
        for i, t in docs_df.select("doc_id", "text").toPandas().itertuples(index=False)
    }
    want = {i: s for i, s in want.items() if s is not None}
    assert got == want
    assert 4 not in got  # zero-token doc excluded
    assert got[0] == got[1]  # exact dups share a fingerprint


def test_simhash_dense_and_sparse_paths_agree(docs_df):
    dense = _collect(simhash63(docs_df, dense_cells=4_000_000))
    sparse = _collect(simhash63(docs_df, dense_cells=1))  # force bincount path
    assert dense == sparse and len(dense) == 7


def test_simhash_plan_has_no_exchange(docs_df):
    plan = simhash63(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
