"""Semantic guarantees of the round-3 text-pipeline operators —
properties the DuckDB-parity contract test cannot express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nil_spark.functions.pii import PII_PATTERNS, pii_counts, scrub
from nil_spark.operators.dedup import duplicated_spans
from nil_spark.operators.winnow import winnow_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- PII


def test_pii_scrub_removes_and_counts(spark):
    d = _docs(
        spark,
        [
            (1, "mail a.b-c_d@sub.example.org now"),
            (2, "host 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 415-555-0134 thanks"),
            (4, "clean text with no pii at all"),
        ],
    )
    out = (
        d.select("doc_id", scrub(F.col("text")).alias("s"), *[
            c.alias(n) for n, c in pii_counts(F.col("text")).items()
        ])
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["s"] == "mail <EMAIL> now" and out[0]["n_email"] == 1
    assert out[1]["s"] == "host <IP> and <IP> up" and out[1]["n_ip"] == 2
    assert out[2]["s"] == "call <PHONE> thanks" and out[2]["n_phone"] == 1
    assert out[3]["s"] == "clean text with no pii at all"
    assert all(r["n_email"] + r["n_ip"] + r["n_phone"] == [1, 2, 1, 0][i]
               for i, r in enumerate(out))


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op (placeholders never
    re-match any pattern)."""
    d = _docs(spark, [(1, "x a@b.co 1.2.3.4 415-555-0134 y")])
    once = d.select(scrub(F.col("text")).alias("s"))
    twice = once.select(scrub(F.col("s")).alias("s"))
    assert once.collect() == twice.collect()


def test_pii_patterns_nonoverlapping_placeholders(spark):
    for _, _, token in PII_PATTERNS:
        assert "@" not in token and "." not in token and "-" not in token


# ------------------------------------------------------ dup spans


def test_dup_spans_marks_shared_window(spark):
    shared = "one two three four five six seven eight"  # exactly w=8 tokens
    d = _docs(
        spark,
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"{shared} delta epsilon zeta"),
            (3, "totally unique words appear only here nine ten eleven"),
        ],
    )
    rows = {r["doc_id"]: r for r in duplicated_spans(d, w=8).collect()}
    # the shared 8-token window occurs in both docs 1 and 2
    assert rows[1]["n_dup_windows"] >= 1
    assert rows[2]["n_dup_windows"] >= 1
    assert rows[3]["n_dup_windows"] == 0 and rows[3]["dup_frac"] == 0.0


def test_dup_spans_within_doc_repeat_counts(spark):
    span = "a b c d e f g h"
    d = _docs(spark, [(1, f"{span} x {span}")])
    r = duplicated_spans(d, w=8).collect()[0]
    # both occurrences of the repeated window are marked
    assert r["n_dup_windows"] >= 2


def test_dup_spans_short_docs_excluded(spark):
    d = _docs(spark, [(1, "only five words right here")])
    assert duplicated_spans(d, w=8).count() == 0


# ------------------------------------------------------ winnowing


def test_winnow_shared_substring_guarantee(spark):
    """Any shared token run of length >= k + w - 1 (= 6) must yield at
    least one shared fingerprint — the winnowing soundness guarantee."""
    shared = "p q r s t u"  # 6 tokens = k + w - 1
    d = _docs(
        spark,
        [
            (1, f"aa bb cc {shared} dd ee"),
            (2, f"{shared} ff gg hh ii jj"),
        ],
    )
    fp = winnow_fingerprints(d, k=3, w=4)
    a = {r["fp"] for r in fp.filter("doc_id = 1").collect()}
    b = {r["fp"] for r in fp.filter("doc_id = 2").collect()}
    assert a & b, "winnowing guarantee violated: no shared fingerprint"


def test_winnow_subsamples(spark):
    """Fingerprints are a strict subsample of all k-gram positions for
    a long-enough doc."""
    text = " ".join(f"tok{i * 7 % 23}" for i in range(60))
    d = _docs(spark, [(1, text)])
    n_fp = winnow_fingerprints(d, k=3, w=4).count()
    n_grams = 60 - 3 + 1
    assert 0 < n_fp < n_grams


def test_winnow_short_doc_no_fingerprints(spark):
    d = _docs(spark, [(1, "one two three four five")])  # 5 < k + w - 1
    assert winnow_fingerprints(d, k=3, w=4).count() == 0
