"""Plan-shape regression guards: the scale properties the engine claims
must be visible in the physical plans Catalyst actually produces —
no accidental cartesian products, small sides broadcast, filters pushed
to the parquet scan."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# exact brute-force baseline is the one deliberate all-pairs operator
CARTESIAN_OK = {"ann_cosine_topk"}


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_no_accidental_cartesian(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = _plan(df)
    if name in CARTESIAN_OK:
        return
    assert "CartesianProduct" not in plan, (
        f"{name} plans a cartesian product:\n{plan[:4000]}"
    )


def test_bm25_broadcasts_query_side(spark):
    plan = _plan(entry_mod.queries()["bm25_topk"](spark, SF_DIR))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan[:3000]


def test_bm25_joins_query_terms_below_tf_aggregate(spark):
    """Filter-early guard: the broadcast join against the distinct
    query-term set must sit BELOW the (doc_id, term) tf aggregate, so
    the corpus-wide tf shuffle never happens — only query-term hits
    reach the groupBy.  In simple-mode explain children print under
    their parents, so a BroadcastHashJoin line must appear after the
    deepest tf HashAggregate line."""
    plan = _plan_simple(entry_mod.queries()["bm25_topk"](spark, SF_DIR))
    lines = plan.splitlines()
    tf_aggs = [
        i
        for i, l in enumerate(lines)
        if "HashAggregate" in l and "doc_id" in l and "term" in l
    ]
    assert tf_aggs, plan[:4000]
    assert any(
        "BroadcastHashJoin" in l for l in lines[tf_aggs[-1] + 1 :]
    ), "no broadcast query-term join below the tf aggregate:\n" + plan[:4000]


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set must probe as a broadcast hash join —
    no shuffle of corpus shingles against an MB-sized eval set."""
    plan = _plan(entry_mod.queries()["decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_snapshot_diff_pushes_source_filter(spark):
    plan = _plan(entry_mod.queries()["snapshot_diff"](spark, SF_DIR))
    assert "PushedFilters" in plan and "src0" in plan, plan[:3000]


def test_doc_stats_prunes_scan_columns(spark):
    """A 2-column aggregate must not read the whole documents schema."""
    plan = _plan(entry_mod.queries()["doc_stats"](spark, SF_DIR))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan[:2000]
    assert "lang" not in read[0] and "source" not in read[0], read[0]


def _plan_simple(df) -> str:
    """Simple-mode explain: each node appears exactly ONCE, with its
    arguments inline (formatted mode lists every node twice — tree +
    detail section — which double-counts Exchange nodes)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(mode)


def _shuffle_exchanges(df) -> list[str]:
    """Shuffle Exchange lines only (BroadcastExchange moves KB-sized
    dimension tables and is not a data shuffle)."""
    return [
        l
        for l in _plan_simple(df).splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]


@pytest.fixture(scope="module")
def _serving(spark, tmp_path_factory):
    """A tiny shard store + termdict for serving-topology plan checks."""
    import glob

    from pyspark.sql import functions as F

    from nil_spark.config import EngineConfig
    from nil_spark.operators.docids import assign_doc_ids
    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
    )
    from nil_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
        gen_queries,
        gen_transcripts,
    )

    cfg = EngineConfig(gram_size=1, num_segments=4)
    pdf = gen_transcripts(800, seed=21)
    docs = assign_doc_ids(
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA), ["conv_id", "turn_idx"]
    )
    shard_dir = str(tmp_path_factory.mktemp("serving_shards"))
    build_partial_segments(docs, cfg).write.mode("overwrite").parquet(shard_dir)
    raw = spark.read.parquet(shard_dir)
    st = raw.filter(F.col("term") == DOCSTAT_SENTINEL).agg(
        F.sum("n_postings").alias("n"), F.sum(F.element_at("bm_max", 1)).alias("s")
    ).collect()[0]
    n_docs, avgdl = int(st["n"]), float(st["s"]) / int(st["n"])
    termdict = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .filter(F.col("df") <= int(cfg.df_stopword_cutoff * n_docs))
        .toPandas()
    )
    qpdf = gen_queries(pdf, n_queries=12, k=5, seed=22)
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))
    return cfg, qpdf, paths, termdict, n_docs, avgdl


@pytest.mark.parametrize("tokenize_on", ["driver", "worker"])
def test_replica_serving_zero_shuffle(spark, _serving, tokenize_on):
    """The replica-resident query job must contain ZERO shuffle
    Exchanges: each query lives in exactly one parallelized split, the
    kernel emits the final rounded tie-broken top-k with rank, and no
    cross-split merge exists to pay for."""
    from nil_spark.operators.segments import topk_replica_resident

    cfg, qpdf, paths, termdict, n_docs, avgdl = _serving
    df = topk_replica_resident(
        spark, qpdf, paths, termdict, n_docs, avgdl, cfg, tokenize_on=tokenize_on
    )
    ex = _shuffle_exchanges(df)
    assert len(ex) == 0, "expected a zero-shuffle job, got:\n" + "\n".join(ex)


def test_sharded_serving_single_shuffle(spark, _serving):
    """Document-sharded scatter/gather: the only data shuffle is the
    shards×k gather merge, and even that is elided when the shard list
    collapses to one partition (SinglePartition already satisfies the
    rank window's clustered distribution).  The shard-list spread moves
    one path string per shard, not data."""
    from nil_spark.operators.segments import topk_maxscore_sharded

    cfg, qpdf, paths, termdict, n_docs, avgdl = _serving
    df = topk_maxscore_sharded(spark, qpdf, paths, termdict, n_docs, avgdl, cfg)
    ex = _shuffle_exchanges(df)
    data_ex = [l for l in ex if "query_id" in l]
    assert len(data_ex) <= 1, "\n".join(ex)
    # any other exchange may only carry the shard path list
    for l in ex:
        assert (
            "query_id" in l
            or "roundrobin" in l.lower()
            or "SinglePartition" in l
        ), l


def test_term_sharded_serving_single_shuffle(spark, _serving):
    """Term-sharded scatter/gather: exactly ONE data shuffle — the
    partial-score exchange hashed by query_id into the per-query
    applyInPandas gather (sum + round + rank in one Arrow pass).  The
    earlier groupBy(qid, doc) + rank-window shape paid a second
    exchange to re-partition from (qid, doc) to qid."""
    from nil_spark.operators.segments import topk_term_sharded

    cfg, qpdf, paths, termdict, n_docs, avgdl = _serving
    df = topk_term_sharded(spark, qpdf, paths, termdict, n_docs, avgdl, cfg)
    ex = _shuffle_exchanges(df)
    assert len(ex) <= 1, "expected at most one shuffle, got:\n" + "\n".join(ex)


def test_verified_search_stays_broadcast(spark):
    """The verification stage must add NO sort-merge join: dterms (wide
    shingle arrays, corpus-derived) streams while the narrow candidate
    and query-term relations broadcast — the only exchanged rows in a
    verified query belong to retrieval and the final rank window."""
    plan = _plan(entry_mod.queries()["bm25_verified_topk"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan[:4000]
    assert "BroadcastHashJoin" in plan


def test_positional_phrase_single_shuffle_and_term_pushdown(spark):
    """Index-native phrase search: the only data shuffle is the
    groupBy(query_id) into the position-intersection kernel; the
    query-term join broadcasts; the term IN (...) predicate reaches
    the positional-store parquet scan as a pushed filter."""
    df = entry_mod.queries()["phrase_search_positional"](spark, SF_DIR)
    ex = _shuffle_exchanges(df)
    assert len(ex) == 1, "expected exactly one shuffle, got:\n" + "\n".join(ex)
    assert "query_id" in ex[0], ex[0]
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:3000]
    assert "In(term" in plan, "term IN filter not pushed:\n" + plan[:3000]


def test_proximity_single_shuffle_and_term_pushdown(spark):
    """Index-native proximity ranking reuses the phrase plan verbatim:
    one data shuffle (groupBy query_id into the distance kernel),
    broadcast query-term join, term IN (...) pushed to the store scan."""
    df = entry_mod.queries()["proximity_topk"](spark, SF_DIR)
    ex = _shuffle_exchanges(df)
    assert len(ex) == 1, "expected exactly one shuffle, got:\n" + "\n".join(ex)
    assert "query_id" in ex[0], ex[0]
    plan = _plan(df)
    assert "In(term" in plan, "term IN filter not pushed:\n" + plan[:3000]


def test_filtered_wand_zero_shuffle(spark):
    """Filtered serving ships the admissible-doc array as a broadcast
    variable, not a join: the query job stays zero-shuffle."""
    df = entry_mod.queries()["bm25_filtered_topk"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        l for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    # the final 6-dp re-rank window is the only permitted exchange
    data = [l for l in shuffles if "terms_json" in l]
    assert not data, "filter leaked a shuffle into serving:\n" + "\n".join(data)
