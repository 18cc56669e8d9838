"""Index-native DSL execution (operators/dsl_exec.py).

The fixed gate query set is oracle-gated in test_entry_contract; here
the boolean algebra itself is fuzzed — random ASTs over the corpus
vocabulary must pick exactly the same doc sets from the replica store
as the pure-Python evaluator picks from the raw text — plus the
soundness guards that refuse configurations where index-native
execution would silently change semantics."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from nil_spark.functions.querylang import (
    And,
    AtLeast,
    Not,
    Or,
    Phrase,
    Term,
    eval_python,
)
from nil_spark.operators.dsl_exec import dsl_search_replica
from nil_spark.plans import entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"

VOCAB = ["hash", "join", "scan", "table", "dup", "fast", "the", "merge",
         "sort", "stream"]


def _rand_ast(rng: random.Random, depth: int = 0):
    roll = rng.random()
    if depth >= 3 or roll < 0.4:
        return Term(rng.choice(VOCAB))
    if roll < 0.55:
        return Phrase(
            tuple(rng.choice(VOCAB) for _ in range(rng.randint(2, 3))),
            rng.choice([0, 0, 1, 3]),
        )
    if roll < 0.65:
        return Not(_rand_ast(rng, depth + 1))
    if roll < 0.75:
        return AtLeast(
            2, tuple(_rand_ast(rng, depth + 1) for _ in range(3))
        )
    cls = And if roll < 0.87 else Or
    return cls(tuple(_rand_ast(rng, depth + 1) for _ in range(2)))


def _to_dsl(node) -> str:
    if isinstance(node, Term):
        return node.word
    if isinstance(node, Phrase):
        q = '"' + " ".join(node.words) + '"'
        return q + (f"~{node.slop}" if node.slop else "")
    if isinstance(node, Not):
        return "NOT " + _to_dsl(node.child)
    if isinstance(node, And):
        return "(" + " AND ".join(_to_dsl(c) for c in node.children) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(_to_dsl(c) for c in node.children) + ")"
    if isinstance(node, AtLeast):
        return (
            f"ATLEAST({node.n}, "
            + ", ".join(_to_dsl(c) for c in node.children)
            + ")"
        )
    raise TypeError(node)


def test_random_asts_match_python_oracle(spark):
    """20 random ASTs through the full engine path (replica postings +
    positional phrases + boolean kernel) — matched doc sets must equal
    the pure-Python evaluation over the raw text."""
    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, SF_DIR
    )
    pos_store, _ = EQ._gate_pos_store(spark, SF_DIR)

    rng = random.Random(0xD5E)
    asts = [_rand_ast(rng) for _ in range(20)]
    qpdf = pd.DataFrame(
        {
            "query_id": list(range(len(asts))),
            "dsl": [_to_dsl(a) for a in asts],
        }
    )
    # k = corpus size so the full matched set (not a top-k) comes back
    got = (
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg,
            k=n_docs, pos_store=pos_store,
        )
        .select("query_id", "doc_id")
        .toPandas()
    )
    got_sets = {
        int(q): set(g["doc_id"].tolist())
        for q, g in got.groupby("query_id")
    }

    raw = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    import re

    toks = {
        int(r.doc_id): [
            t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t
        ]
        for r in raw.itertuples()
    }
    for i, ast in enumerate(asts):
        exp = {d for d, ts in toks.items() if eval_python(ast, ts)}
        assert got_sets.get(i, set()) == exp, f"ast={ast}"


def test_scores_match_dataframe_backend(spark):
    """Engine and DataFrame backends rank-identically on the gate
    query set (both are oracle-gated too; this pins them against each
    other directly with full-precision compare)."""
    from nil_spark.plans.relevance_queries import (
        q_dsl_search,
        q_dsl_search_engine,
    )

    a = q_dsl_search(spark, SF_DIR).toPandas()
    b = q_dsl_search_engine(spark, SF_DIR).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key + ["doc_id"]].equals(b[key + ["doc_id"]])
    assert np.allclose(a["bm25"], b["bm25"], atol=1e-9)


def test_guards(spark):
    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, SF_DIR
    )
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["hash AND join"]})

    import dataclasses

    with pytest.raises(ValueError, match="unigram"):
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl,
            dataclasses.replace(cfg, gram_size=3),
        )
    with pytest.raises(ValueError, match="unpruned"):
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl,
            dataclasses.replace(cfg, df_stopword_cutoff=0.5),
        )
    with pytest.raises(ValueError, match="dense doc ids"):
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl,
            dataclasses.replace(cfg, min_tokens=5),
        )
    with pytest.raises(ValueError, match="positional store"):
        dsl_search_replica(
            spark,
            pd.DataFrame({"query_id": [0], "dsl": ['"hash join"']}),
            shard_paths, td_pdf, n_docs, avgdl, cfg,
        )
