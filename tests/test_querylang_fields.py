"""Field-scoped predicates in the query DSL (querylang FieldTerm /
FieldRange): grammar, null semantics, and four-backend agreement —
Spark Column, DuckDB SQL, pure-Python oracle, and the index-native
kernel reading the doc-values side-cars — including docs with NULL
field values, which the fixed testdata has none of."""

from __future__ import annotations

import random
import re

import numpy as np
import pandas as pd
import pytest

from nil_spark.functions.querylang import (
    And,
    AtLeast,
    FieldRange,
    FieldTerm,
    Not,
    Or,
    QueryParseError,
    Term,
    compile_duckdb,
    compile_spark,
    eval_python,
    field_predicates,
    parse_query,
    positive_terms,
)

VOCAB = ["hash", "join", "scan", "dup", "fast", "merge"]
LANGS = ["en", "de", "es", None]


# ------------------------------------------------------------ grammar


def test_parse_field_predicates():
    q = parse_query("join AND lang:en AND n_chars:[100 TO 500.5]")
    assert q == And(
        (
            Term("join"),
            FieldTerm("lang", "en"),
            FieldRange("n_chars", 100.0, 500.5),
        )
    )
    assert field_predicates(q) == {
        ("keyword", "lang"),
        ("numeric", "n_chars"),
    }
    # filter context: field predicates contribute no scoring terms
    assert positive_terms(q) == ["join"]


def test_parse_open_bounds_and_exists():
    assert parse_query("ts:[* TO 9]") == FieldRange("ts", None, 9.0)
    assert parse_query("ts:[-5 TO *]") == FieldRange("ts", -5.0, None)
    assert parse_query("ts:[* TO *]") == FieldRange("ts", None, None)


def test_parse_field_value_case_preserved():
    # keyword values are unanalyzed (ES keyword field): case-sensitive
    assert parse_query("role:User") == FieldTerm("role", "User")


def test_parse_errors():
    with pytest.raises(QueryParseError, match="lo > hi"):
        parse_query("x:[5 TO 1]")
    with pytest.raises(QueryParseError, match="bad range bound"):
        parse_query("x:[a TO b]")
    with pytest.raises(QueryParseError, match="range needs"):
        parse_query("x:[5]")


def test_compile_unknown_field_raises(spark):
    ast = parse_query("lang:en")
    with pytest.raises(QueryParseError, match="unknown field"):
        compile_duckdb(ast, "toks", "padded", {"other": "other"})
    with pytest.raises(QueryParseError, match="unknown field"):
        from pyspark.sql import functions as F

        compile_spark(ast, F.col("toks"), F.col("padded"), None)


# ---------------------------------------------------- random ASTs


def _rand_ast(rng: random.Random, depth: int = 0):
    roll = rng.random()
    if depth >= 3 or roll < 0.30:
        return Term(rng.choice(VOCAB))
    if roll < 0.45:
        return FieldTerm("lang", rng.choice(["en", "de", "es", "zz"]))
    if roll < 0.60:
        lo = rng.choice([None, rng.randint(0, 400)])
        hi = rng.choice([None, rng.randint(200, 900)])
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo
        return FieldRange("n_chars", lo, hi)
    if roll < 0.70:
        return Not(_rand_ast(rng, depth + 1))
    if roll < 0.78:
        return AtLeast(2, tuple(_rand_ast(rng, depth + 1) for _ in range(3)))
    cls = And if roll < 0.90 else Or
    return cls(tuple(_rand_ast(rng, depth + 1) for _ in range(2)))


def _corpus(rng: random.Random, n: int = 80) -> pd.DataFrame:
    rows = []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(3, 8))]
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(toks),
                "lang": rng.choice(LANGS),
                "n_chars": (
                    None if rng.random() < 0.15 else rng.randint(0, 900)
                ),
            }
        )
    return pd.DataFrame(rows)


def _fields_of(row) -> dict:
    nc = row.n_chars
    return {
        "lang": None if row.lang is None else row.lang,
        "n_chars": None if nc is None or pd.isna(nc) else float(nc),
    }


def test_three_backends_agree_with_nulls(spark):
    """Random field-predicate ASTs over a corpus WITH null field
    values: Spark compile, DuckDB compile, and the Python oracle must
    pick identical doc sets (null never matches; NOT over null
    matches)."""
    import duckdb
    from pyspark.sql import functions as F

    rng = random.Random(0xF1E1D)
    pdf = _corpus(rng)
    asts = [_rand_ast(rng) for _ in range(40)]

    toks = {
        int(r.doc_id): [
            t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t
        ]
        for r in pdf.itertuples()
    }
    fields = {int(r.doc_id): _fields_of(r) for r in pdf.itertuples()}
    expected = [
        {d for d in toks if eval_python(a, toks[d], fields[d])}
        for a in asts
    ]

    sdf = spark.createDataFrame(
        pdf.astype({"n_chars": "float64"})
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("toks"),
    )
    base = sdf.withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    fcols = {"lang": F.col("lang"), "n_chars": F.col("n_chars")}
    marr = F.array(
        *[
            F.struct(
                F.lit(i).alias("q"),
                compile_spark(
                    a, F.col("toks"), F.col("padded"), fcols
                ).alias("m"),
            )
            for i, a in enumerate(asts)
        ]
    )
    got = (
        base.select("doc_id", F.explode(marr).alias("qm"))
        .filter(F.col("qm.m"))
        .select(F.col("qm.q").alias("q"), "doc_id")
        .toPandas()
    )
    spark_sets = {
        int(q): set(g["doc_id"].tolist()) for q, g in got.groupby("q")
    }
    for i, a in enumerate(asts):
        assert spark_sets.get(i, set()) == expected[i], f"spark ast={a}"

    con = duckdb.connect()
    con.register("raw", pdf)
    con.execute(
        "CREATE VIEW dtokp AS SELECT doc_id, lang, n_chars, toks, "
        "' ' || coalesce(array_to_string(toks, ' '), '') || ' ' AS padded "
        "FROM (SELECT doc_id, lang, n_chars, list_filter("
        "regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
        "x -> x <> '') AS toks FROM raw)"
    )
    fexprs = {"lang": "lang", "n_chars": "n_chars"}
    for i, a in enumerate(asts):
        cond = compile_duckdb(a, "toks", "padded", fexprs)
        rows = con.execute(
            f"SELECT doc_id FROM dtokp WHERE {cond}"
        ).fetchall()
        assert {r[0] for r in rows} == expected[i], f"duckdb ast={a}"


def test_engine_backend_agrees_with_nulls(spark, tmp_path):
    """The index-native kernel — replica postings + doc-values
    side-cars (null → NaN / ordinal -1) — picks the same doc sets as
    the Python oracle on the null-bearing corpus."""
    from nil_spark.config import EngineConfig
    from nil_spark.operators.docvalues import (
        docvalues_dir,
        keyword_docvalues_dir,
        write_docvalues,
        write_keyword_docvalues,
    )
    from nil_spark.operators.dsl_exec import dsl_search_replica
    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
    )
    from pyspark.sql import functions as F

    rng = random.Random(0xF1E2D)
    pdf = _corpus(rng)
    asts = [_rand_ast(rng) for _ in range(25)]

    cfg = EngineConfig(
        gram_size=1, min_chars=0, min_tokens=0, df_stopword_cutoff=2.0
    )
    sdf = spark.createDataFrame(pdf.astype({"n_chars": "float64"}))
    idx = str(tmp_path / "idx")
    shard_dir = str(tmp_path / "shards")
    build_partial_segments(
        sdf.select("doc_id", "text").repartition(4), cfg
    ).write.parquet(shard_dir)
    write_docvalues(sdf, idx, ["n_chars"])
    write_keyword_docvalues(sdf, idx, ["lang"])

    raw = spark.read.parquet(shard_dir)
    st = (
        raw.filter(F.col("term") == DOCSTAT_SENTINEL)
        .agg(
            F.sum("n_postings").alias("n"),
            F.sum(F.element_at("bm_max", 1)).alias("s"),
        )
        .collect()[0]
    )
    n_docs, avgdl = int(st["n"]), float(st["s"]) / int(st["n"])
    td_pdf = (
        raw.filter(F.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(F.sum("n_postings").cast("long").alias("df"))
        .toPandas()
    )
    import glob

    shard_paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))

    def to_dsl(n):
        if isinstance(n, Term):
            return n.word
        if isinstance(n, FieldTerm):
            return f"{n.field}:{n.value}"
        if isinstance(n, FieldRange):
            lo = "*" if n.lo is None else repr(float(n.lo))
            hi = "*" if n.hi is None else repr(float(n.hi))
            return f"{n.field}:[{lo} TO {hi}]"
        if isinstance(n, Not):
            return "NOT " + to_dsl(n.child)
        if isinstance(n, And):
            return "(" + " AND ".join(to_dsl(c) for c in n.children) + ")"
        if isinstance(n, Or):
            return "(" + " OR ".join(to_dsl(c) for c in n.children) + ")"
        if isinstance(n, AtLeast):
            return (
                f"ATLEAST({n.n}, "
                + ", ".join(to_dsl(c) for c in n.children)
                + ")"
            )
        raise TypeError(n)

    qpdf = pd.DataFrame(
        {
            "query_id": list(range(len(asts))),
            "dsl": [to_dsl(a) for a in asts],
        }
    )
    got = (
        dsl_search_replica(
            spark,
            qpdf,
            shard_paths,
            td_pdf,
            n_docs,
            avgdl,
            cfg,
            k=n_docs,
            numeric_dv={"n_chars": docvalues_dir(idx, "n_chars")},
            keyword_dv={"lang": keyword_docvalues_dir(idx, "lang")},
        )
        .select("query_id", "doc_id")
        .toPandas()
    )
    got_sets = {
        int(q): set(g["doc_id"].tolist())
        for q, g in got.groupby("query_id")
    }

    toks = {
        int(r.doc_id): [
            t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t
        ]
        for r in pdf.itertuples()
    }
    fields = {int(r.doc_id): _fields_of(r) for r in pdf.itertuples()}
    for i, a in enumerate(asts):
        exp = {d for d in toks if eval_python(a, toks[d], fields[d])}
        assert got_sets.get(i, set()) == exp, f"engine ast={a}"


def test_engine_missing_store_raises(spark):
    from nil_spark.plans import entry_queries as EQ
    from nil_spark.operators.dsl_exec import dsl_search_replica

    sf = "/root/testdata/sf0.001"
    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, sf
    )
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["hash AND lang:en"]})
    with pytest.raises(ValueError, match="keyword-docvalues"):
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg
        )
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["n_chars:[1 TO 2]"]})
    with pytest.raises(ValueError, match="--docvalues"):
        dsl_search_replica(
            spark, qpdf, shard_paths, td_pdf, n_docs, avgdl, cfg
        )


# --------------------------------------------------------- boosts


def test_parse_boosts():
    from nil_spark.functions.querylang import (
        Phrase,
        positive_term_boosts,
    )

    q = parse_query('dup^3 OR "hash join"~2^2 AND merge')
    assert q == Or(
        (
            Term("dup", 3.0),
            And(
                (
                    Phrase(("hash", "join"), 2, 2.0),
                    Term("merge"),
                )
            ),
        )
    )
    assert positive_term_boosts(q) == {
        "dup": 3.0,
        "hash": 2.0,
        "join": 2.0,
        "merge": 1.0,
    }
    # additive repeats (Lucene: a^2 OR a = two scorers)
    assert positive_term_boosts(parse_query("a^2 OR a")) == {"a": 3.0}
    # boosts under NOT score nothing
    assert positive_term_boosts(parse_query("NOT a^5 AND b")) == {
        "b": 1.0
    }
    # a boosted keyword-looking word is a term, not an operator
    assert parse_query("and^2") == Term("and", 2.0)
    # single-word quoted phrase keeps its boost as a Term
    assert parse_query('"dup"^4') == Term("dup", 4.0)
