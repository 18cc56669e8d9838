"""Property fuzz for dup-span marking and winnowing: the Spark
operators must agree with direct naive Python implementations of the
published algorithms on random tiny corpora."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nil_spark.functions.hashing import md5_prefix64_py
from nil_spark.operators.dedup import duplicated_spans
from nil_spark.operators.winnow import winnow_fingerprints

VOCAB = ["aa", "bb", "cc", "dd", "ee"]  # tiny vocab forces collisions/dups

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=20),
    min_size=1,
    max_size=8,
)


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def naive_dup_spans(texts: dict[int, str], w: int) -> dict[int, tuple[int, int]]:
    wins: dict[int, list[str]] = {}
    for i, t in texts.items():
        toks = _toks(t)
        if len(toks) >= w:
            wins[i] = [" ".join(toks[j : j + w]) for j in range(len(toks) - w + 1)]
    from collections import Counter

    counts = Counter(x for v in wins.values() for x in v)
    return {
        i: (len(v), sum(1 for x in v if counts[x] >= 2)) for i, v in wins.items()
    }


def naive_winnow(text: str, k: int, w: int) -> set[int]:
    toks = _toks(text)
    if len(toks) < k + w - 1:
        return set()
    hs = [md5_prefix64_py(" ".join(toks[j : j + k])) for j in range(len(toks) - k + 1)]
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_dup_spans_matches_naive(spark, token_docs):
    texts = {i: " ".join(toks) for i, toks in enumerate(token_docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in duplicated_spans(df, w=4).collect()
    }
    assert got == naive_dup_spans(texts, w=4)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_winnow_matches_naive(spark, token_docs):
    texts = {i: " ".join(toks) for i, toks in enumerate(token_docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, k=2, w=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    exp = {
        i: fp for i, t in texts.items() if (fp := naive_winnow(t, k=2, w=3))
    }
    assert got == exp
