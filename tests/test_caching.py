"""Persist-lifecycle guarantees (functions/caching.tether) and the new
operator guards: no orphaned RDDs survive an operator's result being
consumed and dropped, connected_components refuses to return split
components, lsh_band_keys validates its signature width, and the
file-direct build validates the range-sorted layout from footers.
"""

from __future__ import annotations

import gc

import pytest
from pyspark.sql import functions as F

from nil_spark.operators.dedup import (
    lsh_band_keys,
    minhash_dedup,
    minhash_signatures_wide,
    ngram_jaccard_pairs,
    shingles,
)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i % 3} one two three four five")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("op", [minhash_dedup, ngram_jaccard_pairs])
def test_operator_releases_caches_on_gc(spark, docs, op):
    before = _n_persistent(spark)
    out = op(docs)
    out.collect()
    assert _n_persistent(spark) > before  # caches live while result is
    del out
    gc.collect()
    assert _n_persistent(spark) == before  # tether released them


def test_tracking_releases_caches_on_gc(spark, docs):
    from nil_spark.config import EngineConfig
    from nil_spark.operators.tracking import track_snapshots

    old = docs.filter(F.col("doc_id") < 20)
    new = docs.filter(F.col("doc_id") >= 20).withColumn(
        "doc_id", F.col("doc_id") - 20
    )
    before = _n_persistent(spark)
    out = track_snapshots(
        old, new, EngineConfig(filtration_threshold=10), use_lcs=False
    )
    out.collect()
    del out
    gc.collect()
    assert _n_persistent(spark) == before


def test_emb_neardup_releases_cache_on_gc(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from nil_spark.operators.ann import embedding_neardup_pairs

    before = _n_persistent(spark)
    out = embedding_neardup_pairs(e, threshold=0.2, dims=8)
    out.collect()
    del out
    gc.collect()
    assert _n_persistent(spark) == before


def test_components_raises_on_non_convergence(spark):
    from nil_spark.operators.components import connected_components

    # a 12-vertex chain has diameter 11 > max_iter=3
    verts = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id1 long, id2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=3)
    # and converges fine with enough rounds
    comp = connected_components(verts, edges, max_iter=15)
    assert {r.component for r in comp.collect()} == {0}


def test_lsh_band_keys_validates_width(spark, docs):
    wide = minhash_signatures_wide(shingles(docs), k=12)
    with pytest.raises(ValueError, match="exceeds the 12 minhash"):
        lsh_band_keys(wide, bands=5, rows=3)  # 15 > 12


def test_filedirect_rejects_overlapping_layout(spark, tmp_path):
    import pandas as pd

    from nil_spark.config import EngineConfig
    from nil_spark.operators.segments import build_partial_segments_from_files

    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pd.DataFrame(
        {"conv_id": [0, 5], "turn_idx": [0, 0], "text": ["x y", "y z"]}
    ).to_parquet(a)
    pd.DataFrame(
        {"conv_id": [3, 9], "turn_idx": [0, 0], "text": ["p q", "q r"]}
    ).to_parquet(b)
    with pytest.raises(ValueError, match="range-sorted"):
        build_partial_segments_from_files(spark, [a, b], EngineConfig())
    # the direct-write variant shares the same footer validation
    from nil_spark.operators.segments import build_segment_store_files_direct

    with pytest.raises(ValueError, match="range-sorted"):
        build_segment_store_files_direct(
            spark, [a, b], EngineConfig(), str(tmp_path / "out")
        )
