"""Trained IVF coarse quantizer: the deterministic Spark-native k-means
(ann.kmeans_centroids) must improve recall@10 vs brute force over the
pinned first-N centroid stand-in on the fixture embeddings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nil_spark.operators.ann import ann_ivf_topk, cosine_topk, kmeans_centroids

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _recall(df, truth):
    got = df.toPandas().groupby("query_id")["vec_id"].apply(set).to_dict()
    return sum(len(got.get(k, set()) & v) / len(v) for k, v in truth.items()) / len(
        truth
    )


def test_kmeans_shapes_and_determinism_of_init(emb):
    cents = kmeans_centroids(emb, n_cells=8, n_iter=2).collect()
    assert len(cents) == 8
    assert sorted(r["cell_id"] for r in cents) == list(range(8))
    assert all(len(r["cvec"]) == 64 for r in cents)


def test_trained_centroids_improve_recall(emb, queries):
    brute = cosine_topk(emb, queries, k=10).toPandas()
    truth = brute.groupby("query_id")["vec_id"].apply(set).to_dict()
    pinned = _recall(
        ann_ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4, trained=False), truth
    )
    trained = _recall(
        ann_ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4, trained=True), truth
    )
    # measured 0.45 pinned vs 0.54 trained on this fixture; the margin is
    # far above any FP-ordering jitter in the distributed centroid means
    assert trained > pinned
    assert trained >= 0.5
