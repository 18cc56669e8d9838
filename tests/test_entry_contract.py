"""Replicates the driver's correctness gate locally: every queries()
entry must match its oracle_sql() via DuckDB on the same parquet —
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            bad = ~(
                (gv.isna() & ev.isna())
                | (abs(gv.astype(float) - ev.astype(float)) <= 1e-9)
            )
        else:
            bad = gv.astype(str) != ev.astype(str)
        assert not bad.any(), (
            f"{name}: column {c} mismatch:\n"
            f"{pd.concat([g[bad].head(5), e[bad].head(5)], axis=1)}"
        )


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = qfn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    exp = duck.sql(sql).df()
    _compare(name, got, exp)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.columns == ["query_id", "rank", "doc_id", "bm25"]


def test_readme_inventory_in_sync():
    """README's driver-gated inventory can't drift from the registry:
    every registered query name appears in README.md and the stated
    counts match the live registry."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "README.md")) as f:
        readme = f.read()
    missing = [n for n in ALL if f"`{n}`" not in readme]
    assert not missing, f"README inventory lacks: {missing}"
    n_q = len(entry_mod.queries())
    n_o = len(entry_mod.oracle_sql())
    m = re.search(
        r"\*\*(\d+) registered queries, (\d+) with DuckDB oracles\*\*",
        readme,
    )
    assert m, "README count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
        f"README says {m.groups()}, registry has ({n_q}, {n_o})"
    )
