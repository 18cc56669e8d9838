"""Property fuzz for the compaction rewrite kernel: decode → mask →
re-encode → decode must equal masking the original posting table
directly, for random tables and random tombstone sets — the codec
identity `compact_index` rests on (the e2e reindex-equivalence test
covers the orchestration; this pins the kernel across shapes the
fixture can't reach: empty runs, single-posting terms, chunk-boundary
splits, all-deleted terms)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.config import EngineConfig
from nil_spark.operators.phrase import _membership
from nil_spark.operators.segments import (
    _SEG_COLS,
    _decode_chunk_table,
    _encode_run_table,
)

CFG = EngineConfig(gram_size=1)


def _random_table(rng: np.random.Generator, n_terms: int, max_docs: int):
    rows = []
    for t in range(n_terms):
        docs = np.unique(
            rng.integers(0, max_docs, size=rng.integers(1, 40))
        )
        for d in docs:
            rows.append((t * 7 + 1, int(d), float(rng.integers(1, 9)),
                         float(rng.integers(5, 200))))
    rows.sort()
    arr = np.array(rows, dtype=np.float64)
    return (
        arr[:, 0].astype(np.int64),
        arr[:, 1].astype(np.int64),
        arr[:, 2],
        arr[:, 3],
    )


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10**9), max_chunk=st.sampled_from([4, 16, 1 << 20]))
def test_rewrite_roundtrip(seed, max_chunk):
    rng = np.random.default_rng(seed)
    terms, docs, tfs, dls = _random_table(
        rng, n_terms=rng.integers(1, 8), max_docs=60
    )
    tombs = np.unique(rng.integers(0, 60, size=rng.integers(0, 20)))

    # encode the original, decode it back (as compact reads it)
    pdf = pd.DataFrame(
        _encode_run_table(terms, docs, tfs, dls, CFG, max_chunk,
                          presorted=True),
        columns=_SEG_COLS,
    )
    t2, d2, f2, l2 = _decode_chunk_table(pdf)
    live = ~_membership(tombs, d2) if len(tombs) else np.ones(len(d2), bool)

    if not live.any():
        return  # everything deleted: compact writes an empty shard

    # re-encode the survivors, decode once more
    pdf2 = pd.DataFrame(
        _encode_run_table(t2[live], d2[live], f2[live], l2[live], CFG,
                          max_chunk),
        columns=_SEG_COLS,
    )
    t3, d3, f3, l3 = _decode_chunk_table(pdf2)

    # ground truth: mask the ORIGINAL arrays directly
    gt = ~_membership(tombs, docs) if len(tombs) else np.ones(len(docs), bool)
    assert np.array_equal(t3, terms[gt])
    assert np.array_equal(d3, docs[gt])
    assert np.array_equal(f3, tfs[gt])
    assert np.array_equal(l3, dls[gt])
