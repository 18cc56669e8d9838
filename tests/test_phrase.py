"""Phrase search: kernel definition, candidate semantics, end-to-end
parity with the naive oracle, and the absence-inference guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.config import EngineConfig
from nil_spark.operators.phrase import (
    _count_hits_np,
    count_phrase_hits,
    phrase_candidates_replica,
    phrase_search_replica,
)

VOCAB = ["a", "b", "c", "dup"]


@given(
    doc=st.lists(st.sampled_from(VOCAB), max_size=40),
    ph=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_vectorized_kernel_matches_naive(doc, ph):
    naive = count_phrase_hits(doc, ph)
    fast = _count_hits_np(
        np.asarray(doc, dtype=object), np.asarray(ph, dtype=object)
    )
    assert fast == naive


def test_nonoverlap_rule_pinned():
    # "dup dup" in "dup dup dup dup" = 2 (greedy leftmost, resume past
    # the match); in "dup dup dup" = 1.  This is the case a naive
    # space-join replace-count oracle gets wrong.
    assert count_phrase_hits(["dup"] * 4, ["dup", "dup"]) == 2
    assert count_phrase_hits(["dup"] * 3, ["dup", "dup"]) == 1
    assert count_phrase_hits(["a", "b", "a", "b"], ["a", "b"]) == 2


def _build_index(spark, tmp_path, texts):
    import glob

    from pyspark.sql import functions as F

    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
    )

    cfg = EngineConfig(
        gram_size=1, min_chars=0, min_tokens=0, df_stopword_cutoff=2.0
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    shard_dir = str(tmp_path / "shards")
    build_partial_segments(docs, cfg).write.mode("overwrite").parquet(shard_dir)
    sdf = spark.read.parquet(shard_dir)
    stats = (
        sdf.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(
            F.sum("n_postings").alias("n"),
            F.sum(F.element_at("bm_max", 1)).alias("toks"),
        )
        .collect()[0]
    )
    n_docs, avgdl = int(stats["n"]), float(stats["toks"]) / max(int(stats["n"]), 1)
    td = (
        sdf.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .toPandas()
    )
    return sorted(glob.glob(shard_dir + "/part-*.parquet")), td, n_docs, avgdl, cfg, docs


def test_phrase_end_to_end_matches_naive(spark, tmp_path):
    texts = [
        "the hash join beats the sort merge join",
        "hash join hash join hash join",          # 3 non-overlapping hits
        "a hash, a join - never adjacent hash . join",  # punctuation splits => hit
        "dup dup dup dup",                         # pins the greedy rule
        "dup dup dup",
        "no relevant terms here at all",
        "",                                        # empty doc
        "join hash",                               # reversed: candidate, no hit
    ]
    shard_paths, td, n_docs, avgdl, cfg, docs = _build_index(spark, tmp_path, texts)
    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "text": ["hash join", "dup dup", "sort merge join"]}
    )
    got = (
        phrase_search_replica(
            spark, queries, shard_paths, td, n_docs, avgdl, cfg, docs
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )

    # naive oracle over every (query, doc)
    from nil_spark.functions.tokenize import tokenize_series

    dtoks = tokenize_series(pd.Series(texts), cfg)
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
    # spot-pin the headline semantics
    g = got.set_index(["query_id", "doc_id"])["hits"]
    assert g.loc[(0, 1)] == 3
    assert g.loc[(1, 3)] == 2 and g.loc[(1, 4)] == 1
    assert (0, 7) not in g.index  # reversed order: filtered by verify


def test_absent_term_means_no_candidates(spark, tmp_path):
    shard_paths, td, n_docs, avgdl, cfg, _ = _build_index(
        spark, tmp_path, ["alpha beta gamma", "beta gamma delta"]
    )
    q = pd.DataFrame({"query_id": [0], "text": ["beta zeta"]})
    out = phrase_candidates_replica(
        spark, q, shard_paths, td, n_docs, avgdl, cfg
    ).toPandas()
    assert len(out) == 0


def test_pruned_dictionary_refused(spark, tmp_path):
    shard_paths, td, n_docs, avgdl, cfg, _ = _build_index(
        spark, tmp_path, ["alpha beta", "beta gamma"]
    )
    pruned = cfg.with_(df_stopword_cutoff=0.5)
    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    with pytest.raises(ValueError, match="unpruned"):
        phrase_candidates_replica(
            spark, q, shard_paths, td, n_docs, avgdl, pruned
        )


def test_phrase_shorter_than_gram_refused(spark, tmp_path):
    shard_paths, td, n_docs, avgdl, cfg, _ = _build_index(
        spark, tmp_path, ["alpha beta gamma"]
    )
    tri = cfg.with_(gram_size=3)
    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    with pytest.raises(ValueError, match="shorter than gram_size"):
        phrase_candidates_replica(
            spark, q, shard_paths, td, n_docs, avgdl, tri
        )


# --------------------------------------------------- boolean retrieval


def test_boolean_search_matches_naive(spark, tmp_path):
    from nil_spark.operators.phrase import boolean_search_replica

    texts = [
        "the hash join beats the sort merge join",
        "hash join hash join hash join",
        "a hash, a join - never adjacent hash . join",
        "dup dup table dup dup",
        "dup hash dup",
        "no relevant terms here at all",
        "",
        "join hash table",
    ]
    shard_paths, td, n_docs, avgdl, cfg, _ = _build_index(spark, tmp_path, texts)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "must": ["hash join", "dup", "hash", "zeta hash"],
            "must_not": ["table", "hash", "", "join"],
        }
    )
    got = (
        boolean_search_replica(
            spark, queries, shard_paths, td, n_docs, avgdl, cfg
        )
        .toPandas().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    )
    import re

    exp = []
    for qid, must, mnot in zip(
        queries["query_id"], queries["must"], queries["must_not"]
    ):
        ms = {t for t in re.split(r"[^a-z0-9]+", must.lower()) if t}
        ns = {t for t in re.split(r"[^a-z0-9]+", mnot.lower()) if t}
        for did, text in enumerate(texts):
            toks = {t for t in re.split(r"[^a-z0-9]+", text.lower()) if t}
            if ms <= toks and not (ns & toks):
                exp.append((qid, did))
    exp_df = (
        pd.DataFrame(exp, columns=["query_id", "doc_id"])
        .sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp_df.astype("int64"))
    assert not (got["query_id"] == 3).any()  # absent must term => empty


def test_boolean_search_guards(spark, tmp_path):
    from nil_spark.operators.phrase import boolean_search_replica

    shard_paths, td, n_docs, avgdl, cfg, _ = _build_index(
        spark, tmp_path, ["hash join", "dup"]
    )
    with pytest.raises(ValueError, match="at least one must term"):
        boolean_search_replica(
            spark,
            pd.DataFrame({"query_id": [0], "must": [""], "must_not": ["hash"]}),
            shard_paths, td, n_docs, avgdl, cfg,
        )
    with pytest.raises(ValueError, match="unpruned term dictionary"):
        boolean_search_replica(
            spark,
            pd.DataFrame({"query_id": [0], "must": ["hash"], "must_not": [""]}),
            shard_paths, td, n_docs, avgdl, cfg.with_(df_stopword_cutoff=0.5),
        )


def test_boolean_search_refuses_ngram_index(spark, tmp_path):
    from nil_spark.operators.phrase import boolean_search_replica

    shard_paths, td, n_docs, avgdl, cfg, _ = _build_index(
        spark, tmp_path, ["hash join table scan", "dup hash"]
    )
    with pytest.raises(ValueError, match="unigram index"):
        boolean_search_replica(
            spark,
            pd.DataFrame({"query_id": [0], "must": ["hash"], "must_not": [""]}),
            shard_paths, td, n_docs, avgdl, cfg.with_(gram_size=2),
        )
