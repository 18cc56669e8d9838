"""Property test for the vectorized posting transpose: for arbitrary
token streams and gram sizes, _transpose_tokens must agree exactly with
the per-doc reference path (terms_for_tokens + np.unique)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import terms_for_tokens
from nil_spark.operators.segments import _transpose_tokens

TOKENS = st.lists(
    st.sampled_from(["a", "b", "ab", "xyz", "w1", "w2", "q"]), max_size=12
)


@given(
    docs=st.lists(TOKENS, max_size=8),
    gram=st.integers(1, 4),
    distinct=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_transpose_matches_perdoc(docs, gram, distinct):
    cfg = EngineConfig(gram_size=gram, distinct_ngrams=distinct)
    ids = np.arange(100, 100 + len(docs), dtype=np.int64)
    dls = np.array([len(d) for d in docs], dtype=np.int64)
    terms, docv, tfs, dlv = _transpose_tokens(docs, ids, dls, cfg)

    exp = []
    for i, d in enumerate(docs):
        th = terms_for_tokens(d, cfg)
        if distinct:
            u, c = th, np.ones(len(th), dtype=np.int64)
        else:
            u, c = np.unique(th, return_counts=True)
        for t, tf in zip(u, c):
            exp.append((int(t), int(ids[i]), int(tf), int(dls[i])))
    exp.sort()
    got = sorted(
        (int(t), int(d), int(tf), int(dl))
        for t, d, tf, dl in zip(terms, docv, tfs, dlv)
    )
    assert got == exp
    # presorted contract for _encode_run_table: (term, doc) ascending
    assert all(
        (terms[i], docv[i]) <= (terms[i + 1], docv[i + 1])
        for i in range(len(terms) - 1)
    )
