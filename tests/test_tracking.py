"""P4 tracking cascade (operators/tracking.py) vs the pure-Python
oracle: exact -> content_hash -> similarity (n-gram filter + LCS
verify, mutual-best assignment), each stage consuming the previous
stage's unmatched residue (method_tracker.py:239-375)."""

from __future__ import annotations

import pandas as pd
import pytest

from nil_spark.config import EngineConfig
from nil_spark.operators.tracking import track_snapshots
from nil_spark.testing.oracle import track_cascade

CFG = EngineConfig(gram_size=3)
COLS = ["id_old", "id_new", "stage", "ngram_sim", "lcs_sim"]


def _edit(text: str) -> str:
    toks = text.split()
    kept = toks[: max(3, (len(toks) * 3) // 4)]
    return " ".join("zzz" if i % 5 == 4 else t for i, t in enumerate(kept))


@pytest.fixture(scope="module")
def snapshots(transcripts_1k):
    texts = (
        transcripts_1k.sort_values(["conv_id", "turn_idx"])["text"]
        .tolist()[:400]
    )
    old = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts, "skey": range(len(texts))}
    )
    rows = []
    for i, t in enumerate(texts):
        if i % 10 == 0:
            continue  # deleted
        if i % 7 == 3:
            rows.append((5000 + i, t, 90000 + i))  # moved: content_hash stage
        elif i % 7 == 5:
            rows.append((5000 + i, _edit(t), 90000 + i))  # edited+moved: similarity
        else:
            rows.append((5000 + i, t, i))  # stable signature: exact stage
    for j in range(20):  # brand-new docs, must stay unmatched
        rows.append((9000 + j, f"completely fresh turn number {j} qqq www eee", 95000 + j))
    new = pd.DataFrame(rows, columns=["doc_id", "text", "skey"])
    return old, new


@pytest.mark.parametrize("use_lcs", [True, False])
def test_cascade_matches_oracle(spark, snapshots, use_lcs):
    old_pdf, new_pdf = snapshots
    old = spark.createDataFrame(old_pdf, "doc_id long, text string, skey long")
    new = spark.createDataFrame(new_pdf, "doc_id long, text string, skey long")
    got = (
        track_snapshots(old, new, CFG, sig_cols=["skey"], use_lcs=use_lcs)
        .toPandas()
        .sort_values(["id_old", "id_new"])
        .reset_index(drop=True)
    )
    exp = (
        pd.DataFrame(
            track_cascade(old_pdf, new_pdf, CFG, ["skey"], use_lcs=use_lcs),
            columns=COLS,
        )
        .sort_values(["id_old", "id_new"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp), f"{len(got)} matches vs oracle {len(exp)}"
    for c in ["id_old", "id_new", "stage"]:
        assert (got[c].values == exp[c].values).all(), c
    for c in ["ngram_sim", "lcs_sim"]:
        assert got[c].astype("Int64").equals(exp[c].astype("Int64")), c
    # the cascade must exercise all three stages on this fixture
    stages = set(got["stage"])
    assert stages == {"exact", "content_hash", "similarity"}, stages
    # residue discipline: a doc id matches at most once across stages
    assert got["id_old"].is_unique and got["id_new"].is_unique
    # fresh docs never match
    assert not got["id_new"].isin(range(9000, 9020)).any()
