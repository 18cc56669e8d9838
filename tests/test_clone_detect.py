"""Two-tier clone detection must reproduce the oracle's pair set
exactly — ids, n-gram similarity, and (nullable) LCS similarity."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.config import EngineConfig
from nil_spark.functions.lcs import hs_lcs
from nil_spark.operators.clone import clone_detect
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.testing.oracle import OracleIndex, clone_pairs, hunt_szymanski_lcs, naive_lcs

CFG = EngineConfig(gram_size=5, distinct_ngrams=True, df_stopword_cutoff=1.0)


@given(
    st.lists(st.integers(0, 8), max_size=40),
    st.lists(st.integers(0, 8), max_size=40),
)
@settings(max_examples=300, deadline=None)
def test_lcs_implementations_agree(a, b):
    expect = naive_lcs(a, b)
    assert hs_lcs(a, b) == expect            # engine kernel
    assert hunt_szymanski_lcs(a, b) == expect  # oracle kernel


def test_clone_pairs_match_oracle(spark, transcripts_1k):
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    got = (
        clone_detect(docs, CFG)
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(transcripts_1k, CFG)
    exp = pd.DataFrame(
        clone_pairs(oracle), columns=["id1", "id2", "ngram_sim", "lcs_sim"]
    ).sort_values(["id1", "id2"]).reset_index(drop=True)
    assert len(got) > 0, "corpus plants ~7% duplicates; pairs must exist"
    assert len(got) == len(exp), f"{len(got)} pairs vs oracle {len(exp)}"
    assert (got["id1"].values == exp["id1"].values).all()
    assert (got["id2"].values == exp["id2"].values).all()
    assert (got["ngram_sim"].values == exp["ngram_sim"].values).all()
    ge = got["lcs_sim"].astype("Int64")
    ee = exp["lcs_sim"].astype("Int64")
    assert ge.equals(ee), pd.concat([got[ge != ee], exp[ge != ee]], axis=1).head(10)
    # both tiers must be exercised
    assert got["lcs_sim"].isna().any(), "tier-1 short-circuit path unused"
    assert got["lcs_sim"].notna().any(), "tier-2 LCS path unused"


def test_verify_cap_bounds_lcs_input(spark, transcripts_1k):
    """verify_cap must hard-bound the residue entering the Python LCS
    stage: with verification_threshold=0 every verified pair is
    emitted, so the output size equals min(cap, candidates) and equals
    the deterministic top-cap-by-(sim desc, id1, id2) candidate
    subset."""
    from nil_spark.operators.clone import candidate_pairs

    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    cfg = CFG.with_(verification_threshold=0)
    cand = candidate_pairs(docs, cfg).toPandas()
    assert len(cand) > 5
    cap = 5
    got = clone_detect(docs, cfg, mode="always_lcs", verify_cap=cap).toPandas()
    assert len(got) == cap
    exp = (
        cand.sort_values(["sim", "id1", "id2"], ascending=[False, True, True])
        .head(cap)[["id1", "id2"]]
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    g = got[["id1", "id2"]].sort_values(["id1", "id2"]).reset_index(drop=True)
    assert g.equals(exp)


def test_always_lcs_mode(spark, transcripts_1k):
    """Single-tier variant (NormalCloneDetection.kt:16-45): every pair
    carries an LCS similarity >= delta; pair set = candidates whose LCS
    passes, computed from the oracle kernels."""
    docs = spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"], num_partitions=4)
    got = (
        clone_detect(docs, CFG, mode="always_lcs")
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got["lcs_sim"].notna().all(), "single-tier must always verify by LCS"
    assert (got["lcs_sim"] >= CFG.verification_threshold).all()

    # cross-check against the two-tier run: the tier-2 (residue) pairs
    # of two_tier appear identically here, and every always_lcs pair is
    # a filtration-surviving candidate
    two = clone_detect(docs, CFG).toPandas()
    residue = two[two["lcs_sim"].notna()].sort_values(["id1", "id2"])
    merged = residue.merge(got, on=["id1", "id2"], suffixes=("_t", "_a"))
    assert len(merged) == len(residue)
    assert (merged["lcs_sim_t"].values == merged["lcs_sim_a"].values).all()
