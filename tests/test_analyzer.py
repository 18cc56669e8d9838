"""The analysis chain (EngineConfig.analyzer).

Lucene analyzer semantics: the same chain folds BOTH the indexed
corpus and every query, or terms never meet.  Cases pin:

 * the minimal-English plural stemmer's rule table;
 * BM25 serving over a stemmed index is rank-identical to the
   pure-Python oracle running the same chain, and singular queries
   match plural-only docs;
 * index-native DSL execution folds query words (analyze_ast) so
   boolean queries agree with the stemmed index;
 * the config fingerprint drifts under a non-standard analyzer
   (querying a stemmed index with unstemmed tokens must refuse, not
   silently miss) while staying byte-stable for "standard";
 * the CLI lifecycle in fresh JVMs, including the structured
   config-mismatch error when --analyzer is dropped at query time.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import (
    apply_analyzer,
    stem_minimal_english,
)
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import (
    _cfg_fingerprint,
    build_partial_segments,
    topk_replica_resident,
)
from nil_spark.testing.oracle import OracleIndex

CFG = EngineConfig(
    gram_size=1, min_chars=0, min_tokens=0, df_stopword_cutoff=2.0,
    analyzer="minimal_english",
)

DOCS = [
    ("c0", 0, "the tables scans run fast"),        # plurals only
    ("c1", 0, "one table one scan slow"),          # singulars only
    ("c2", 0, "tables tables tables scan"),        # tf folds together
    ("c3", 0, "glass focus analysis basis"),       # -ss/-us/-is exempt
    ("c4", 0, "its was gas this"),                 # short / exempt tails
    ("c5", 0, "joins merges windows streams"),
]


@pytest.mark.parametrize(
    "tok,expect",
    [
        ("tables", "table"),
        ("scans", "scan"),
        ("merges", "merge"),
        ("windows", "window"),
        ("glass", "glass"),      # -ss
        ("focus", "focus"),      # -us
        ("analysis", "analysis"),  # -is
        ("basis", "basis"),
        ("gas", "gas"),          # len 3
        ("its", "its"),
        ("was", "was"),
        ("s", "s"),
        ("rows", "row"),
    ],
)
def test_stemmer_rule_table(tok, expect):
    assert stem_minimal_english(tok) == expect


def test_apply_analyzer_dispatch():
    assert apply_analyzer(["tables"], CFG) == ["table"]
    std = CFG.with_(analyzer="standard")
    assert apply_analyzer(["tables"], std) == ["tables"]
    with pytest.raises(ValueError, match="unknown analyzer"):
        apply_analyzer(["x"], CFG.with_(analyzer="porter"))


def test_fingerprint_drifts_only_when_nonstandard():
    std = CFG.with_(analyzer="standard")
    assert _cfg_fingerprint(std) != _cfg_fingerprint(CFG)
    # "standard" keeps the pre-analyzer fingerprint shape: the field is
    # appended only when non-standard, so every existing index stays
    # openable
    assert _cfg_fingerprint(std) == _cfg_fingerprint(
        EngineConfig(
            gram_size=1, min_chars=0, min_tokens=0, df_stopword_cutoff=2.0
        )
    )


@pytest.fixture(scope="module")
def stemmed_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stemmed_idx"))
    pdf = pd.DataFrame(DOCS, columns=["conv_id", "turn_idx", "text"])
    docs = assign_doc_ids(spark.createDataFrame(pdf))
    build_partial_segments(
        docs.select("doc_id", "text").repartition(2), CFG
    ).write.mode("overwrite").parquet(d)
    paths = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    oracle = OracleIndex(pdf, CFG)
    return paths, oracle, pdf


def test_bm25_over_stemmed_index_matches_oracle(spark, stemmed_index):
    paths, oracle, pdf = stemmed_index
    n_docs, avgdl = oracle.n_docs, oracle.avgdl
    termdict = pd.DataFrame(
        [(t, len(ps)) for t, ps in oracle.postings.items()],
        columns=["term", "df"],
    )
    queries = ["table scan", "tables scans", "join merge", "glass focus"]
    qpdf = pd.DataFrame(
        {
            "query_id": range(len(queries)),
            "text": queries,
            "k": [10] * len(queries),
        }
    )
    got = (
        topk_replica_resident(
            spark, qpdf, paths, termdict, n_docs, avgdl, CFG
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for qid, qtext in enumerate(queries):
        exp = oracle.bm25_topk(qtext, 10)
        g = got[got.query_id == qid]
        assert list(zip(g["rank"], g["doc_id"])) == [
            (r, d) for r, d, _ in exp
        ], (qtext, list(zip(g["rank"], g["doc_id"])), exp)
        for (_, _, s_exp), s_got in zip(exp, g["bm25"]):
            assert abs(s_exp - s_got) < 1e-6

    # the folding claim itself: a singular query reaches plural-only
    # docs — doc 0 ("tables scans...") must be in "table scan" hits
    q0 = got[got.query_id == 0]["doc_id"].tolist()
    assert 0 in q0  # doc 0 = ("c0", 0, "the tables scans run fast")
    # and both surface forms of the query retrieve identically
    q1 = got[got.query_id == 1][["rank", "doc_id"]].values.tolist()
    assert q1 == got[got.query_id == 0][["rank", "doc_id"]].values.tolist()


def test_dsl_folds_query_words(spark, stemmed_index):
    from nil_spark.operators.dsl_exec import dsl_search_replica

    paths, oracle, pdf = stemmed_index
    termdict = pd.DataFrame(
        [(t, len(ps)) for t, ps in oracle.postings.items()],
        columns=["term", "df"],
    )
    dsl_pdf = pd.DataFrame(
        {
            "query_id": [0, 1],
            "dsl": ["tables AND scans", "table AND scan"],
        }
    )
    got = (
        dsl_search_replica(
            spark, dsl_pdf, paths, termdict, oracle.n_docs, oracle.avgdl,
            CFG, k=10, universe_mode="indexed",
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    a = got[got.query_id == 0][["doc_id", "bm25"]].values.tolist()
    b = got[got.query_id == 1][["doc_id", "bm25"]].values.tolist()
    assert a and a == b  # both surface forms, identical folded answer


def test_cli_analyzer_lifecycle(spark, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra, analyzer=True):
        base = [sys.executable, os.path.join(repo, "cli_main.py"),
                "--master", "local[2]", "--shuffle-partitions", "4"]
        if analyzer:
            base += ["--analyzer", "minimal_english"]
        return subprocess.run(
            base + extra, capture_output=True, text=True, timeout=300,
            cwd=repo,
        )

    corpus = str(tmp_path / "corpus.parquet")
    pdf = pd.DataFrame(
        [(c, i, "user", t, None, None) for c, i, t in DOCS],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(corpus)
    qp = str(tmp_path / "q.parquet")
    spark.createDataFrame(
        [(0, "table scan", 10)], "query_id long, text string, k int"
    ).write.mode("overwrite").parquet(qp)

    idx = str(tmp_path / "idx")
    r = run(["build", "--input", corpus, "--index-dir", idx])
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "res")
    r = run(["query", "--index-dir", idx, "--queries", qp, "--out", out])
    assert r.returncode == 0, r.stderr
    res = spark.read.parquet(out).toPandas()
    assert len(res) > 0  # singular query hits the plural corpus

    # dropping --analyzer at query time = config drift → structured
    # error, never silently-unfolded tokens
    r = run(["query", "--index-dir", idx, "--queries", qp,
             "--out", str(tmp_path / "res2")], analyzer=False)
    assert r.returncode == 2
    err = json.loads(r.stderr.strip().splitlines()[-1])
    assert err["error"] == "config mismatch"
