"""North-rule invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering.

The engine assigns docID = rank under (conv_id, turn_idx)
(operators/docids.py) — so the doc_id -> text mapping produced by the
distributed path must byte-match the single-process enumeration of the
same corpus sorted the same way, regardless of input partitioning.
Reference analog: the md5 content identity of CodeBlock
(/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/entity/
CodeBlock.kt:29-34), with the reference's nondeterministic
insertion-order ids (Preprocess.kt:27-49) replaced by pinned ordering.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nil_spark.operators.docids import assign_doc_ids
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def test_per_turn_text_equality_stable_ordering(spark, transcripts_1k):
    expected = transcripts_1k.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)

    # adversarial input partitioning: shuffle the rows before ingest
    scrambled = transcripts_1k.sample(frac=1.0, random_state=7)
    docs = spark.createDataFrame(scrambled, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs.repartition(7), ["conv_id", "turn_idx"])

    got = (
        docs.select("doc_id", "conv_id", "turn_idx", "text", F.md5("text").alias("h"))
        .orderBy("doc_id")
        .toPandas()
    )

    assert got["doc_id"].tolist() == list(range(len(expected)))
    assert got["conv_id"].tolist() == expected["conv_id"].tolist()
    assert got["turn_idx"].tolist() == expected["turn_idx"].tolist()
    # per-turn text equality, byte-exact
    assert got["text"].tolist() == expected["text"].tolist()
    exp_md5 = [hashlib.md5(t.encode()).hexdigest() for t in expected["text"]]
    assert got["h"].tolist() == exp_md5


def test_doc_ids_deterministic_across_runs(spark, transcripts_1k):
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    a = (
        assign_doc_ids(docs.repartition(3), ["conv_id", "turn_idx"])
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        assign_doc_ids(docs.repartition(11), ["conv_id", "turn_idx"])
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
