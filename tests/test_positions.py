"""Positional store: encode/decode roundtrip, the packed-key phrase
matcher vs the naive counter, and end-to-end parity between the
positional path and the text-verify path on the same corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import _hash_token, tokenize_series
from nil_spark.operators.phrase import count_phrase_hits
from nil_spark.operators.positions import (
    _decode_pos_chunk,
    _encode_pos_table,
    build_position_segments,
    phrase_hits_from_positions,
    phrase_search_positional,
)

VOCAB = ["a", "b", "c", "dup", "x"]


# --------------------------------------------------- codec roundtrip


@given(
    n_terms=st.integers(1, 4),
    n_docs=st.integers(1, 6),
    seed=st.integers(0, 10_000),
    max_chunk=st.sampled_from([1, 2, 3, 1 << 20]),
)
@settings(max_examples=100, deadline=None)
def test_pos_encode_decode_roundtrip(n_terms, n_docs, seed, max_chunk):
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(n_terms):
        for d in range(n_docs):
            k = int(rng.integers(0, 5))
            if k == 0:
                continue
            ps = np.sort(rng.choice(200, size=k, replace=False))
            rows.extend((t * 7 + 1, d * 3, int(p)) for p in ps)
    if not rows:
        return
    arr = np.asarray(rows, dtype=np.int64)
    order = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))
    arr = arr[order]
    enc = _encode_pos_table(arr[:, 0], arr[:, 1], arr[:, 2], max_chunk)
    pdf = pd.DataFrame(enc)
    got = []
    for row in pdf.itertuples():
        d, p = _decode_pos_chunk(row)
        got.extend((int(row.term), int(dd), int(pp)) for dd, pp in zip(d, p))
    got = np.asarray(sorted(got), dtype=np.int64)
    assert np.array_equal(got, np.asarray(sorted(map(tuple, arr)), np.int64))


# ------------------------------------------------ packed-key matcher


def _keys_for(docs_toks: list) -> dict:
    keys: dict = {}
    for did, toks in enumerate(docs_toks):
        for p, t in enumerate(toks):
            h = int(_hash_token(t))
            keys.setdefault(h, []).append((did << 32) | p)
    return {
        h: np.sort(np.asarray(v, dtype=np.uint64)) for h, v in keys.items()
    }


@given(
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), max_size=30), min_size=1, max_size=6
    ),
    ph=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_positional_matcher_matches_naive(docs, ph):
    term_keys = _keys_for(docs)
    terms = [int(_hash_token(t)) for t in ph]
    got_d, got_h = phrase_hits_from_positions(term_keys, terms)
    got = dict(zip(got_d.tolist(), got_h.tolist()))
    exp = {
        did: count_phrase_hits(toks, ph)
        for did, toks in enumerate(docs)
        if count_phrase_hits(toks, ph) >= 0
    }
    exp = {k: v for k, v in exp.items() if v >= 1}
    got = {k: v for k, v in got.items() if v >= 1}
    assert got == exp


# ------------------------------------------------------- end to end


TEXTS = [
    "the hash join beats the sort merge join",
    "hash join hash join hash join",
    "a hash, a join - never adjacent hash . join",
    "dup dup dup dup",
    "dup dup dup",
    "no relevant terms here at all",
    "",
    "join hash",
]


@pytest.fixture(scope="module")
def pos_store(spark, tmp_path_factory):
    cfg = EngineConfig(gram_size=1, min_chars=0, min_tokens=0)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}),
        "doc_id long, text string",
    )
    out = str(tmp_path_factory.mktemp("pos") / "store")
    (
        build_position_segments(docs.repartition(3), cfg)
        .repartitionByRange(2, "term")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite").parquet(out)
    )
    return spark.read.parquet(out), cfg


def test_positional_end_to_end_matches_naive(spark, pos_store):
    store, cfg = pos_store
    queries = pd.DataFrame(
        {"query_id": [0, 1, 2, 3],
         "text": ["hash join", "dup dup", "sort merge join", "zeta hash"]}
    )
    got = (
        phrase_search_positional(spark, queries, store, cfg)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    dtoks = tokenize_series(pd.Series(TEXTS), cfg)
    exp = []
    for qid, qt in zip(queries["query_id"], queries["text"]):
        ph = list(tokenize_series(pd.Series([qt]), cfg)[0])
        for did, dt in enumerate(dtoks):
            h = count_phrase_hits(list(dt), ph)
            if h >= 1:
                exp.append((qid, did, h))
    exp = (
        pd.DataFrame(exp, columns=["query_id", "doc_id", "hits"])
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"hits": "int64"}), exp.astype({"hits": "int64"})
    )
    g = got.set_index(["query_id", "doc_id"])["hits"]
    assert g.loc[(0, 1)] == 3          # back-to-back triple
    assert g.loc[(1, 3)] == 2          # greedy non-overlap
    assert g.loc[(1, 4)] == 1
    assert not (got["query_id"] == 3).any()  # absent term => no rows


def test_positional_matches_text_verify_path(spark, pos_store, tmp_path):
    """The two phrase implementations (index-native positional vs
    replica-candidates + text verify) must be row-identical."""
    import glob

    from pyspark.sql import functions as F

    from nil_spark.operators.phrase import phrase_search_replica
    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
    )

    store, cfg = pos_store
    cfg2 = cfg.with_(df_stopword_cutoff=2.0)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}),
        "doc_id long, text string",
    )
    shard_dir = str(tmp_path / "freq")
    build_partial_segments(docs, cfg2).write.mode("overwrite").parquet(shard_dir)
    sdf = spark.read.parquet(shard_dir)
    stats = (
        sdf.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(F.sum("n_postings").alias("n"),
             F.sum(F.element_at("bm_max", 1)).alias("s"))
        .collect()[0]
    )
    n_docs, avgdl = int(stats["n"]), float(stats["s"]) / int(stats["n"])
    td = (
        sdf.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .toPandas()
    )
    queries = pd.DataFrame(
        {"query_id": [0, 1], "text": ["hash join", "dup dup"]}
    )
    a = (
        phrase_search_positional(spark, queries, store, cfg2)
        .toPandas().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    )
    b = (
        phrase_search_replica(
            spark, queries,
            sorted(glob.glob(shard_dir + "/part-*.parquet")),
            td, n_docs, avgdl, cfg2, docs,
        )
        .toPandas().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------- proximity ranking


@given(
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), max_size=30), min_size=1, max_size=6
    ),
    pair=st.tuples(st.sampled_from(VOCAB), st.sampled_from(VOCAB)),
)
@settings(max_examples=300, deadline=None)
def test_min_pair_distance_matches_naive(docs, pair):
    """Adjacent-merge distance kernel vs the O(n²) all-pairs scan."""
    from nil_spark.operators.positions import min_pair_distance

    t1, t2 = pair
    if t1 == t2:
        return
    term_keys = _keys_for(docs)
    ka = term_keys.get(int(_hash_token(t1)), np.empty(0, np.uint64))
    kb = term_keys.get(int(_hash_token(t2)), np.empty(0, np.uint64))
    got_d, got_m = min_pair_distance(ka, kb)
    got = dict(zip(got_d.tolist(), got_m.tolist()))
    exp = {}
    for did, toks in enumerate(docs):
        pa = [p for p, t in enumerate(toks) if t == t1]
        pb = [p for p, t in enumerate(toks) if t == t2]
        if pa and pb:
            exp[did] = min(abs(a - b) for a in pa for b in pb)
    assert got == exp


def test_proximity_end_to_end(spark, pos_store):
    """Distributed proximity ranking over the tmp store: ranks,
    distances, AND-semantics, and absent-term emptiness."""
    from nil_spark.operators.positions import proximity_search_positional

    store, cfg = pos_store
    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "text": ["hash join", "dup the", "zeta hash"]}
    )
    got = (
        proximity_search_positional(spark, queries, store, cfg, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    dtoks = tokenize_series(pd.Series(TEXTS), cfg)
    for qid, qt in zip(queries["query_id"], queries["text"]):
        t1, t2 = qt.split()
        exp = {}
        for did, toks in enumerate(dtoks):
            pa = [p for p, t in enumerate(toks) if t == t1]
            pb = [p for p, t in enumerate(toks) if t == t2]
            if pa and pb:
                exp[did] = min(abs(a - b) for a in pa for b in pb)
        sub = got[got["query_id"] == qid]
        expected = sorted(exp.items(), key=lambda kv: (kv[1], kv[0]))[:10]
        assert list(zip(sub["doc_id"], sub["min_dist"])) == expected, qt
        assert list(sub["rank"]) == list(range(1, len(expected) + 1))
    assert not (got["query_id"] == 2).any()  # absent term => no rows


def test_proximity_rejects_single_term(spark, pos_store):
    from nil_spark.operators.positions import proximity_search_positional

    store, cfg = pos_store
    with pytest.raises(ValueError, match="two distinct terms"):
        proximity_search_positional(
            spark, pd.DataFrame({"query_id": [0], "text": ["dup dup"]}),
            store, cfg,
        )


def test_build_rejects_doc_ids_beyond_32_bits():
    """Packed (doc << 32 | pos) keys: a doc id overflowing the high
    half would merge its occurrences into another doc's list — the
    build must refuse, not alias."""
    from nil_spark.operators.positions import _MAX_POS, _pos_partition_frame

    cfg = EngineConfig(gram_size=1, min_chars=0, min_tokens=0)
    pdf = pd.DataFrame({"doc_id": [_MAX_POS + 1], "text": ["hash join"]})
    with pytest.raises(ValueError, match="exceeds 32 bits"):
        _pos_partition_frame(pdf, cfg, 1 << 20)


# ----------------------------------------------- ordered span-near


@given(
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), max_size=30), min_size=1, max_size=6
    ),
    pair=st.tuples(st.sampled_from(VOCAB), st.sampled_from(VOCAB)),
)
@settings(max_examples=300, deadline=None)
def test_min_ordered_gap_matches_naive(docs, pair):
    """Carry-forward ordered-gap kernel vs the O(n²) all-pairs scan."""
    from nil_spark.operators.positions import min_ordered_gap

    t1, t2 = pair
    if t1 == t2:
        return
    term_keys = _keys_for(docs)
    ka = term_keys.get(int(_hash_token(t1)), np.empty(0, np.uint64))
    kb = term_keys.get(int(_hash_token(t2)), np.empty(0, np.uint64))
    got_d, got_g = min_ordered_gap(ka, kb)
    got = dict(zip(got_d.tolist(), got_g.tolist()))
    exp = {}
    for did, toks in enumerate(docs):
        pa = [p for p, t in enumerate(toks) if t == t1]
        pb = [p for p, t in enumerate(toks) if t == t2]
        gaps = [b - a for a in pa for b in pb if b > a]
        if gaps:
            exp[did] = min(gaps)
    assert got == exp


def test_span_near_end_to_end_ordered(spark, pos_store):
    """span_near is ORDER-sensitive: 'hash join' and 'join hash' give
    different answers on the same store; window bounds enforced."""
    from nil_spark.operators.positions import span_near_positional

    store, cfg = pos_store
    queries = pd.DataFrame(
        {"query_id": [0, 1], "text": ["hash join", "join hash"]}
    )
    got = (
        span_near_positional(spark, queries, store, cfg, window=3, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    dtoks = tokenize_series(pd.Series(TEXTS), cfg)
    for qid, qt in zip(queries["query_id"], queries["text"]):
        t1, t2 = qt.split()
        exp = {}
        for did, ts in enumerate(dtoks):
            pa = [p for p, t in enumerate(ts) if t == t1]
            pb = [p for p, t in enumerate(ts) if t == t2]
            gaps = [b - a for a in pa for b in pb if 0 < b - a <= 3]
            if gaps:
                exp[did] = min(gaps)
        sub = got[got["query_id"] == qid]
        expected = sorted(exp.items(), key=lambda kv: (kv[1], kv[0]))[:10]
        assert list(zip(sub["doc_id"], sub["min_gap"])) == expected, qt
    # the two orders disagree somewhere (TEXTS has 'join hash' at doc 7)
    a = set(got[got["query_id"] == 0]["doc_id"])
    b = set(got[got["query_id"] == 1]["doc_id"])
    assert a != b


def test_span_near_rejects_bad_window(spark, pos_store):
    from nil_spark.operators.positions import span_near_positional

    store, cfg = pos_store
    with pytest.raises(ValueError, match="window must be >= 1"):
        span_near_positional(
            spark,
            pd.DataFrame({"query_id": [0], "text": ["hash join"]}),
            store, cfg, window=0,
        )


# ------------------------------------------------ minimal window


@given(
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), max_size=30), min_size=1, max_size=6
    ),
    terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True),
)
@settings(max_examples=300, deadline=None)
def test_min_window_matches_naive(docs, terms):
    """Two-pointer minimal-window kernel vs brute force over all
    occurrence combinations (min spread; ties -> leftmost start)."""
    from itertools import product

    from nil_spark.operators.positions import min_window

    term_keys = _keys_for(docs)
    occ = [
        term_keys.get(int(_hash_token(t)), np.empty(0, np.uint64))
        for t in terms
    ]
    got_d, got_s, got_w = min_window(occ)
    got = {d: (s, w) for d, s, w in zip(got_d, got_s, got_w)}
    exp = {}
    for did, toks in enumerate(docs):
        plists = [[p for p, t in enumerate(toks) if t == q] for q in terms]
        if any(not pl for pl in plists):
            continue
        best = None
        for combo in product(*plists):
            wl = max(combo) - min(combo)
            st_ = min(combo)
            if best is None or (wl, st_) < best:
                best = (wl, st_)
        exp[did] = (best[1], best[0])
    assert got == exp, terms


def test_min_window_end_to_end(spark, pos_store):
    from nil_spark.operators.positions import min_window_positional

    store, cfg = pos_store
    queries = pd.DataFrame(
        {"query_id": [0, 1], "text": ["hash join sort", "zeta hash join"]}
    )
    got = (
        min_window_positional(spark, queries, store, cfg, k=10)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    # doc 0: "the hash join beats the sort merge join" — window
    # hash(1)..sort(5) = len 4 starting at 1; only doc containing all 3
    sub = got[got["query_id"] == 0]
    assert list(zip(sub["doc_id"], sub["win_start"], sub["win_len"])) == [
        (0, 1, 4)
    ]
    assert not (got["query_id"] == 1).any()  # absent term => no rows
