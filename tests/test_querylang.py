"""Query-DSL parser + three-backend consistency.

One grammar, three compilers (pure Python, PySpark Column, DuckDB SQL)
— the property that matters is that all three accept the same language
and pick the same documents.  Python-vs-DuckDB is fuzzed per-example
(cheap); Python-vs-Spark evaluates a seeded batch of random ASTs in a
single Spark job (the same one-scan array-of-structs shape
dsl_search uses)."""

from __future__ import annotations

import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.functions.querylang import (
    And,
    AtLeast,
    Not,
    Or,
    Phrase,
    QueryParseError,
    Term,
    compile_duckdb,
    compile_spark,
    eval_python,
    parse_query,
    positive_terms,
)

VOCAB = ["a", "b", "c", "d", "e"]


# ------------------------------------------------------------- grammar


def test_precedence_or_lowest():
    ast = parse_query("a OR b AND c")
    assert ast == Or((Term("a"), And((Term("b"), Term("c")))))


def test_implicit_and():
    assert parse_query("a b c") == And((Term("a"), Term("b"), Term("c")))


def test_not_binds_tightest():
    ast = parse_query("NOT a AND b")
    assert ast == And((Not(Term("a")), Term("b")))


def test_parens_override():
    ast = parse_query("(a OR b) AND c")
    assert ast == And((Or((Term("a"), Term("b"))), Term("c")))


def test_phrase_and_singleton_phrase():
    assert parse_query('"a b"') == Phrase(("a", "b"))
    assert parse_query('"a"') == Term("a")  # 1-word phrase degrades to term
    assert parse_query('"a b"~3') == Phrase(("a", "b"), 3)
    assert parse_query('"a"~3') == Term("a")  # slop on 1 word is a no-op


def test_case_insensitive_terms_and_keywords():
    assert parse_query("A and B") == And((Term("a"), Term("b")))


def test_atleast_grammar_and_degenerate_forms():
    assert parse_query("ATLEAST(2, a, b, c)") == AtLeast(
        2, (Term("a"), Term("b"), Term("c"))
    )
    # n=1 degrades to OR, n=m to AND (no separate node to execute)
    assert parse_query("ATLEAST(1, a, b)") == Or((Term("a"), Term("b")))
    assert parse_query("ATLEAST(2, a, b)") == And((Term("a"), Term("b")))
    # nests like any atom
    assert parse_query("NOT ATLEAST(2, a, b, c)") == Not(
        AtLeast(2, (Term("a"), Term("b"), Term("c")))
    )


@pytest.mark.parametrize(
    "bad", ["", "AND", "a AND", "(a", 'a)"', '""', "a %% b", "NOT",
            "ATLEAST(0, a, b)", "ATLEAST(3, a, b)", "ATLEAST(2)",
            "ATLEAST(a, b)", "ATLEAST 2, a"]
)
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse_query(bad)


def test_positive_terms_skips_negated():
    ast = parse_query('a AND NOT b OR "c d" AND NOT (e OR a)')
    # NOT(e OR a) negates e, but 'a' still appears positively elsewhere
    assert positive_terms(ast) == ["a", "c", "d"]


# ------------------------------------------------ random AST generator


def _rand_ast(rng: random.Random, depth: int = 0):
    roll = rng.random()
    if depth >= 3 or roll < 0.35:
        return Term(rng.choice(VOCAB))
    if roll < 0.5:
        n = rng.randint(2, 3)
        slop = rng.choice([0, 0, 1, 2, 4])
        return Phrase(
            tuple(rng.choice(VOCAB) for _ in range(n)), slop
        )
    if roll < 0.6:
        return Not(_rand_ast(rng, depth + 1))
    if roll < 0.7:
        m = rng.randint(3, 4)
        return AtLeast(
            rng.randint(2, m - 1),
            tuple(_rand_ast(rng, depth + 1) for _ in range(m)),
        )
    cls = And if roll < 0.87 else Or
    return cls(
        tuple(_rand_ast(rng, depth + 1) for _ in range(rng.randint(2, 3)))
    )


def _rand_doc(rng: random.Random) -> list:
    return [rng.choice(VOCAB) for _ in range(rng.randint(0, 12))]


# ------------------------------------- python vs duckdb (per example)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10**9))
def test_python_vs_duckdb(seed):
    rng = random.Random(seed)
    ast = _rand_ast(rng)
    docs = [_rand_doc(rng) for _ in range(40)]
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(doc_id INT, toks VARCHAR[])")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", list(enumerate(docs))
        )
        # NB: DuckDB's array_to_string([]) is NULL (Spark's array_join
        # is '') — without the coalesce, NOT-phrase queries silently
        # drop empty docs. Pinned here; mirrored in _dsl_sql.
        expr = compile_duckdb(
            ast,
            "toks",
            "' ' || coalesce(array_to_string(toks, ' '), '') || ' '",
        )
        got = {
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM t WHERE {expr}"
            ).fetchall()
        }
    finally:
        con.close()
    exp = {i for i, d in enumerate(docs) if eval_python(ast, d)}
    assert got == exp, f"ast={ast}"


# ------------------------------------------ python vs spark (batched)


def test_python_vs_spark_batch(spark):
    from pyspark.sql import functions as F

    rng = random.Random(0xD51)
    asts = [_rand_ast(rng) for _ in range(40)]
    docs = [_rand_doc(rng) for _ in range(60)]

    sdf = spark.createDataFrame(
        list(enumerate(docs)), "doc_id int, toks array<string>"
    ).withColumn(
        "padded", F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" "))
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("q"),
                compile_spark(a, F.col("toks"), F.col("padded")).alias("m"),
            )
            for i, a in enumerate(asts)
        ]
    )
    got = {
        (r.q, r.doc_id)
        for r in sdf.select("doc_id", F.explode(arr).alias("qm"))
        .filter(F.col("qm.m"))
        .select(F.col("qm.q").alias("q"), "doc_id")
        .collect()
    }
    exp = {
        (i, j)
        for i, a in enumerate(asts)
        for j, d in enumerate(docs)
        if eval_python(a, d)
    }
    assert got == exp


# ------------------------------------------------- parse → roundtrip


def test_dsl_gate_queries_parse():
    from nil_spark.plans.relevance_queries import DSL_QUERIES

    for _, text in DSL_QUERIES:
        ast = parse_query(text)
        assert positive_terms(ast) is not None
