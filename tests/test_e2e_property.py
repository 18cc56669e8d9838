"""End-to-end property test: for RANDOM tiny corpora and queries, the
Spark engine (fused build -> replica serving AND the join-based
MaxScore path) must be rank-identical to the pure-Python oracle.

This is the fuzzing complement to the fixed-fixture rank-identity
suite: hypothesis drives token collisions, hot terms, empty/short
texts, and degenerate queries through the full pipeline.
"""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    build_partial_segments,
    merge_segments,
    topk_maxscore,
    topk_maxscore_sharded,
    topk_replica_resident,
    topk_term_sharded,
)
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.testing.oracle import OracleIndex

CFG = EngineConfig(gram_size=1, num_segments=2, block_size=8)

# tiny vocabulary forces hot terms + stopword-cutoff edges; punctuation
# exercises the tokenizer split; "" exercises empty-doc handling
TOKEN = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x1", "y2", "z", "the", "of"]
)
TEXT = st.lists(TOKEN, min_size=0, max_size=12).map(" ".join)


def _corpus(texts: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"c{i // 3:04d}" for i in range(len(texts))],
            "turn_idx": [i % 3 for i in range(len(texts))],
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [None] * len(texts),
            "ts": pd.to_datetime("2025-01-01"),
        }
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(TEXT, min_size=3, max_size=20),
    qtexts=st.lists(TEXT.filter(lambda t: t), min_size=1, max_size=4),
)
def test_random_corpora_rank_identical(spark, tmp_path_factory, texts, qtexts):
    pdf = _corpus(texts)
    qpdf = pd.DataFrame(
        {
            "query_id": range(len(qtexts)),
            "text": qtexts,
            "k": [3] * len(qtexts),
        }
    )
    docs = assign_doc_ids(
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=2,
    )
    shard_dir = str(tmp_path_factory.mktemp("fuzz") / "shards")
    build_partial_segments(docs.repartition(2), CFG).write.parquet(shard_dir)
    raw = spark.read.parquet(shard_dir)
    st_row = (
        raw.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s"))
        .collect()[0]
    )
    n_docs = int(st_row["n"] or 0)
    if n_docs == 0:  # every doc filtered (all-empty corpus)
        return
    avgdl = float(st_row["s"]) / n_docs
    termdict = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
    )
    if CFG.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(F.col("df") <= int(CFG.df_stopword_cutoff * n_docs))
    td_pdf = termdict.toPandas()
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))

    oracle = (
        OracleIndex(pdf, CFG)
        .topk_frame(qpdf)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    got_r = (
        topk_replica_resident(spark, qpdf, paths, td_pdf, n_docs, avgdl, CFG)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    q = spark.createDataFrame(qpdf, "query_id long, text string, k int")
    got_m = (
        topk_maxscore(
            q, raw.filter(F.col("term") != DOCSTAT_SENTINEL),
            spark.createDataFrame(td_pdf) if len(td_pdf) else termdict,
            n_docs, avgdl, CFG,
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    got_s = (
        topk_maxscore_sharded(spark, qpdf, paths, td_pdf, n_docs, avgdl, CFG)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    merged_dir = shard_dir + "_merged"
    merge_segments(raw.filter(F.col("term") != DOCSTAT_SENTINEL), CFG).write.parquet(
        merged_dir
    )
    got_t = (
        topk_term_sharded(
            spark, qpdf, sorted(glob.glob(merged_dir + "/part-*.parquet")),
            td_pdf, n_docs, avgdl, CFG,
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    for name, got in (
        ("replica", got_r),
        ("maxscore", got_m),
        ("doc_sharded", got_s),
        ("term_sharded", got_t),
    ):
        assert len(got) == len(oracle), (name, texts, qtexts)
        if len(oracle) == 0:
            continue
        assert (got["doc_id"].values == oracle["doc_id"].values).all(), (
            name, texts, qtexts,
        )
        assert np.allclose(
            got["bm25"].values.astype(float),
            oracle["bm25"].values.astype(float),
            atol=1e-6,
        ), (name, texts, qtexts)


# ---------------------------------- boolean / positional path fuzzing


NZTOKEN = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x1", "y2", "z", "the", "of"]
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(TEXT, min_size=3, max_size=16),
    must=st.lists(NZTOKEN, min_size=1, max_size=3),
    must_not=st.lists(NZTOKEN, min_size=0, max_size=2),
    ph=st.lists(NZTOKEN, min_size=1, max_size=3),
    pair=st.tuples(NZTOKEN, NZTOKEN).filter(lambda p: p[0] != p[1]),
)
def test_random_corpora_boolean_and_positional_match_naive(
    spark, tmp_path_factory, texts, must, must_not, ph, pair
):
    """Boolean retrieval, index-native phrase search, and proximity
    ranking against their pure-Python definitions on random corpora —
    token collisions, hot terms, repeated/contradictory query terms,
    and empty docs included."""
    from nil_spark.operators.phrase import (
        boolean_search_replica,
        count_phrase_hits,
    )
    from nil_spark.operators.positions import (
        build_position_segments,
        phrase_search_positional,
        proximity_search_positional,
    )

    cfg = CFG.with_(df_stopword_cutoff=2.0, min_chars=0, min_tokens=0)
    pdf = _corpus(texts)
    docs = assign_doc_ids(
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA),
        ["conv_id", "turn_idx"],
        num_partitions=2,
    )
    base = tmp_path_factory.mktemp("fuzzbp")
    shard_dir = str(base / "shards")
    build_partial_segments(docs.repartition(2), cfg).write.parquet(shard_dir)
    raw = spark.read.parquet(shard_dir)
    st_row = (
        raw.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(F.sum("n_postings").alias("n"),
             F.sum(F.element_at("bm_max", 1)).alias("s"))
        .collect()[0]
    )
    n_docs = int(st_row["n"] or 0)
    if n_docs == 0:
        return
    avgdl = float(st_row["s"]) / n_docs
    td_pdf = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .toPandas()
    )
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))
    pos_dir = str(base / "pos")
    build_position_segments(
        docs.select("doc_id", "text"), cfg
    ).write.parquet(pos_dir)
    store = spark.read.parquet(pos_dir)

    # doc_id == construction index (assign_doc_ids ranks the synthetic
    # (conv_id, turn_idx) keys in construction order)
    dtoks = [t.split() for t in texts]

    # boolean vs set algebra
    got = (
        boolean_search_replica(
            spark,
            pd.DataFrame({"query_id": [0], "must": [" ".join(must)],
                          "must_not": [" ".join(must_not)]}),
            paths, td_pdf, n_docs, avgdl, cfg,
        )
        .toPandas()["doc_id"].sort_values().tolist()
    )
    ms, ns = set(must), set(must_not)
    exp = [
        d for d, ts in enumerate(dtoks)
        if ms <= set(ts) and not (ns & set(ts))
    ]
    assert got == exp, (must, must_not)

    # positional phrase vs naive count
    gp = (
        phrase_search_positional(
            spark, pd.DataFrame({"query_id": [0], "text": [" ".join(ph)]}),
            store, cfg,
        )
        .toPandas().sort_values("doc_id")
    )
    ep = {
        d: count_phrase_hits(ts, ph)
        for d, ts in enumerate(dtoks)
        if count_phrase_hits(ts, ph) >= 1
    }
    assert dict(zip(gp["doc_id"], gp["hits"])) == ep, ph

    # proximity vs naive min distance
    gx = (
        proximity_search_positional(
            spark,
            pd.DataFrame({"query_id": [0], "text": [f"{pair[0]} {pair[1]}"]}),
            store, cfg, k=max(len(texts), 1),
        )
        .toPandas().sort_values("doc_id")
    )
    ex = {}
    for d, ts in enumerate(dtoks):
        pa = [p for p, t in enumerate(ts) if t == pair[0]]
        pb = [p for p, t in enumerate(ts) if t == pair[1]]
        if pa and pb:
            ex[d] = min(abs(a - b) for a in pa for b in pb)
    assert dict(zip(gx["doc_id"], gx["min_dist"])) == ex, pair

    # ordered span-near vs naive (window 3 keeps it selective)
    from nil_spark.operators.positions import span_near_positional

    gs = (
        span_near_positional(
            spark,
            pd.DataFrame({"query_id": [0], "text": [f"{pair[0]} {pair[1]}"]}),
            store, cfg, window=3, k=max(len(texts), 1),
        )
        .toPandas().sort_values("doc_id")
    )
    es = {}
    for d, ts in enumerate(dtoks):
        pa = [p for p, t in enumerate(ts) if t == pair[0]]
        pb = [p for p, t in enumerate(ts) if t == pair[1]]
        gaps = [b - a for a in pa for b in pb if 0 < b - a <= 3]
        if gaps:
            es[d] = min(gaps)
    assert dict(zip(gs["doc_id"], gs["min_gap"])) == es, pair
