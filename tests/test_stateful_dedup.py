"""applyInPandasWithState streaming exact-dedup: cross-batch state,
deterministic canonical assignment, agreement with the batch operator."""

from __future__ import annotations

import os

import pandas as pd

from nil_spark.operators.dedup import exact_dedup
from nil_spark.streaming.stateful_dedup import streaming_exact_dedup


def test_streaming_dedup_matches_batch(spark, transcripts_1k, tmp_path):
    docs = (
        transcripts_1k.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)[["text"]]
        .assign(doc_id=lambda d: d.index.astype("int64"))[["doc_id", "text"]]
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    half = len(docs) // 2
    ck, out_dir = str(tmp_path / "ck"), str(tmp_path / "out")
    # two arrivals in ascending doc_id order; the second must dedup
    # against state built by the first (cross-batch duplicates exist:
    # the generator plants ~2% exact copies of EARLIER turns)
    for i, part in enumerate((docs.iloc[:half], docs.iloc[half:])):
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(in_dir, f"arrival{i}")
        )
        streaming_exact_dedup(spark, in_dir + "/arrival*", ck, out_dir)

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(docs)

    batch = (
        exact_dedup(spark.createDataFrame(docs))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["canon_id"].values == batch["canon_id"].values).all()
    assert (got["is_dup"].values == (batch["doc_id"] != batch["canon_id"]).values).all()
    assert got["is_dup"].any(), "fixture must contain exact duplicates"
    # cross-batch dedup actually exercised: some dup in the second half
    # has its canonical doc in the first half
    second = got[got["doc_id"] >= half]
    assert (second["is_dup"] & (second["canon_id"] < half)).any()
