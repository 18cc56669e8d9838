"""CLI --mode dsl: the boolean query language through the spark-submit
surface (fresh JVMs), matched sets pinned to the pure-Python evaluator,
and every refusal path structured (JSON on stderr, exit 2)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nil_spark.functions.querylang import eval_python, parse_query
from nil_spark.sources.transcripts import gen_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list, env: dict | None = None) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli_main.py"),
         "--master", "local[2]", "--shuffle-partitions", "4", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env={**os.environ, **env} if env else None,
    )


def _err(out) -> dict:
    return json.loads(out.stderr.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def dsl_index(tmp_path_factory):
    """Index built boolean-capable: unpruned dictionary + positional
    side-car store."""
    tmp = tmp_path_factory.mktemp("cli_dsl")
    pdf = gen_transcripts(300, seed=41)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp / "corpus.parquet"),
    )
    idx_dir = str(tmp / "idx")
    out = _run(["--stopword-cutoff", "2.0",
                "build", "--input", str(tmp / "corpus.parquet"),
                "--index-dir", idx_dir, "--positions",
                "--docvalues", "turn_idx",
                "--keyword-docvalues", "role"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return tmp, idx_dir, pdf


def _toks_by_doc(pdf) -> dict:
    """doc_id → token list under the CLI's assign_doc_ids contract
    (0-based rank by (conv_id, turn_idx)) and the engine tokenizer."""
    ordered = pdf.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    return {
        i: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        for i, txt in enumerate(ordered["text"])
    }


def test_cli_dsl_matches_python_oracle(dsl_index):
    tmp, idx_dir, pdf = dsl_index
    toks = _toks_by_doc(pdf)
    # pick two words that actually occur so the queries have real work
    from collections import Counter

    freq = Counter(t for ts in toks.values() for t in ts)
    w1, w2 = [w for w, _ in freq.most_common(2)]
    dsls = [
        f"{w1} AND NOT {w2}",
        f'"{w1} {w2}" OR {w2}',
        f"NOT {w1}",
    ]
    qpdf = pd.DataFrame({"query_id": range(len(dsls)), "dsl": dsls})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp / "dslq.parquet"),
    )
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "-k", "100000",
                "--queries", str(tmp / "dslq.parquet"),
                "--out", str(tmp / "dslres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["mode"] == "dsl"

    got = pd.concat(
        pq.read_table(os.path.join(tmp / "dslres", f)).to_pandas()
        for f in os.listdir(tmp / "dslres")
        if f.endswith(".parquet")
    )
    got_sets = {
        int(q): set(g["doc_id"].tolist())
        for q, g in got.groupby("query_id")
    }
    for i, dsl in enumerate(dsls):
        ast = parse_query(dsl)
        exp = {d for d, ts in toks.items() if eval_python(ast, ts)}
        assert got_sets.get(i, set()) == exp, dsl


def test_cli_dsl_field_predicates(dsl_index):
    """Field predicates through the CLI: keyword (role) and numeric
    (turn_idx) doc-values stores resolved from the index dir, matched
    sets pinned to the Python evaluator over the raw transcript
    fields."""
    tmp, idx_dir, pdf = dsl_index
    toks = _toks_by_doc(pdf)
    ordered = pdf.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    fields = {
        i: {"role": r.role, "turn_idx": float(r.turn_idx)}
        for i, r in enumerate(ordered.itertuples())
    }
    from collections import Counter

    freq = Counter(t for ts in toks.values() for t in ts)
    (w1, _), = freq.most_common(1)
    dsls = [
        f"{w1} AND role:user",
        "turn_idx:[1 TO 3]",
        f"NOT role:user AND {w1}",
        f"{w1} AND turn_idx:[* TO 2] AND NOT role:assistant",
    ]
    qpdf = pd.DataFrame({"query_id": range(len(dsls)), "dsl": dsls})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp / "fieldq.parquet"),
    )
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "-k", "100000",
                "--queries", str(tmp / "fieldq.parquet"),
                "--out", str(tmp / "fieldres")])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = pd.concat(
        pq.read_table(os.path.join(tmp / "fieldres", f)).to_pandas()
        for f in os.listdir(tmp / "fieldres")
        if f.endswith(".parquet")
    )
    got_sets = {
        int(q): set(g["doc_id"].tolist())
        for q, g in got.groupby("query_id")
    }
    for i, dsl in enumerate(dsls):
        ast = parse_query(dsl)
        exp = {
            d for d, ts in toks.items()
            if eval_python(ast, ts, fields[d])
        }
        assert got_sets.get(i, set()) == exp, dsl


def test_cli_dsl_missing_docvalues_refused(dsl_index):
    """A field with no doc-values store fails structured with the
    rebuild hint, not a worker traceback."""
    tmp, idx_dir, _ = dsl_index
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["lang:en"]})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp / "missq.parquet"),
    )
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", str(tmp / "missq.parquet"),
                "--out", str(tmp / "missres")])
    assert out.returncode == 2
    e = _err(out)
    assert e["error"] == "no doc-values store for field"
    assert e["field"] == "lang" and "--keyword-docvalues" in e["hint"]


def test_cli_dsl_null_query_structured(dsl_index):
    """A NULL dsl cell must fail structured, not silently search for
    the literal token 'none' (str(None))."""
    tmp, idx_dir, _ = dsl_index
    qpdf = pd.DataFrame({"query_id": [3], "dsl": [None]})
    pq.write_table(
        pa.Table.from_pandas(qpdf.astype({"dsl": "object"}),
                             preserve_index=False),
        str(tmp / "nullq.parquet"),
    )
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", str(tmp / "nullq.parquet"),
                "--out", str(tmp / "nullres")])
    assert out.returncode == 2
    e = _err(out)
    assert e["error"] == "bad dsl query" and e["query_id"] == 3


def test_cli_dsl_parse_error_structured(dsl_index):
    tmp, idx_dir, _ = dsl_index
    qpdf = pd.DataFrame({"query_id": [7], "dsl": ["(unclosed AND"]})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp / "badq.parquet"),
    )
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", str(tmp / "badq.parquet"),
                "--out", str(tmp / "badres")])
    assert out.returncode == 2
    e = _err(out)
    assert e["error"] == "bad dsl query" and e["query_id"] == 7


def test_cli_dsl_pruned_index_refused(tmp_path):
    """An index built with the default stopword pruning cannot serve
    NOT soundly — the CLI must refuse structured, not silently
    mis-answer."""
    pdf = gen_transcripts(200, seed=43)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "corpus.parquet"),
    )
    idx_dir = str(tmp_path / "idx")
    out = _run(["build", "--input", str(tmp_path / "corpus.parquet"),
                "--index-dir", idx_dir])
    assert out.returncode == 0
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ["hello AND world"]})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp_path / "q.parquet"),
    )
    out = _run(["query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "res")])
    assert out.returncode == 2
    assert _err(out)["error"] == "index unsuitable for dsl"


def test_cli_dsl_phrase_without_positions_refused(tmp_path):
    pdf = gen_transcripts(200, seed=44)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "corpus.parquet"),
    )
    idx_dir = str(tmp_path / "idx")
    out = _run(["--stopword-cutoff", "2.0",
                "build", "--input", str(tmp_path / "corpus.parquet"),
                "--index-dir", idx_dir])  # no --positions
    assert out.returncode == 0
    qpdf = pd.DataFrame({"query_id": [0], "dsl": ['"agent tool call"']})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp_path / "q.parquet"),
    )
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", str(tmp_path / "q.parquet"),
                "--out", str(tmp_path / "res")])
    assert out.returncode == 2
    assert _err(out)["error"] == "no positional store"


def test_cli_dsl_phrase_doc_set_cap(dsl_index):
    """A phrase whose matching doc set exceeds the broadcastable bound
    (forced tiny via NIL_DSL_PHRASE_DOCS_MAX) is refused with a
    structured error BEFORE any driver materialization — the round-4
    verdict stop-phrase guard ('What's wrong #4')."""
    tmp, idx_dir, pdf = dsl_index
    toks = _toks_by_doc(pdf)
    # find a bigram occurring in >= 2 docs (a 'hot phrase' at this scale)
    from collections import Counter

    big = Counter()
    for ts in toks.values():
        for a, b in set(zip(ts, ts[1:])):
            big[(a, b)] += 1
    (a, b), n = big.most_common(1)[0]
    assert n >= 2, "corpus has no repeated bigram — fixture too small"
    qpdf = pd.DataFrame({"query_id": [0], "dsl": [f'"{a} {b}"']})
    qp = str(tmp / "q_phrasecap.parquet")
    pq.write_table(pa.Table.from_pandas(qpdf, preserve_index=False), qp)
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", qp, "--out", str(tmp / "res_phrasecap")],
               env={"NIL_DSL_PHRASE_DOCS_MAX": "1"})
    assert out.returncode == 2, out.stdout[-2000:] + out.stderr[-2000:]
    err = _err(out)
    assert err["error"] == "phrase matches too many docs"
    assert f"{a} {b}" in err["detail"]
    # the same query under the default bound serves fine
    out2 = _run(["--stopword-cutoff", "2.0",
                 "query", "--index-dir", idx_dir, "--mode", "dsl",
                 "--queries", qp, "--out", str(tmp / "res_phrasecap2")])
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-2000:]


def test_cli_dsl_flag_conflicts_and_schema(dsl_index):
    tmp, idx_dir, _ = dsl_index
    qpdf = pd.DataFrame({"query_id": [0], "text": ["not the dsl column"]})
    pq.write_table(
        pa.Table.from_pandas(qpdf, preserve_index=False),
        str(tmp / "wrongschema.parquet"),
    )
    # ranked-retrieval flags don't compose with dsl mode
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--topology", "wand",
                "--queries", str(tmp / "wrongschema.parquet"),
                "--out", str(tmp / "x1")])
    assert out.returncode == 2
    assert "--topology" in _err(out)["error"]
    # (query_id, dsl) schema required
    out = _run(["--stopword-cutoff", "2.0",
                "query", "--index-dir", idx_dir, "--mode", "dsl",
                "--queries", str(tmp / "wrongschema.parquet"),
                "--out", str(tmp / "x2")])
    assert out.returncode == 2
    assert _err(out)["error"] == "bad query schema"
