"""t-digest quantile sketch (operators/tdigest.py) — the declared
scale swap-in for the exact ``percentiles_agg`` gate row: accuracy
bounds vs numpy exact quantiles, associative/deterministic merging,
serialization, and the one-pass Spark mapInPandas path."""

from __future__ import annotations

import numpy as np
import pytest

from nil_spark.operators.tdigest import TDigest, percentiles_sketch

QS = [0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


def _worst_rank_err(d: TDigest, data: np.ndarray) -> float:
    s = np.sort(data)
    n = len(s)
    worst = 0.0
    for q in QS:
        est = d.quantile(q)
        lo = np.searchsorted(s, est, side="left")
        hi = np.searchsorted(s, est, side="right")
        # distance from the target rank to the est value's rank RANGE
        # (ties make a single rank ill-defined)
        target = q * n
        err = max(0.0, lo - target, target - hi)
        worst = max(worst, err / n)
    return worst


@pytest.mark.parametrize(
    "dist",
    ["uniform", "normal", "lognormal", "integers"],
)
def test_accuracy_bounds(dist):
    rng = np.random.default_rng(hash(dist) % 2**32)
    data = {
        "uniform": lambda: rng.uniform(0, 1e6, 150_000),
        "normal": lambda: rng.normal(0, 1, 150_000),
        "lognormal": lambda: rng.lognormal(4, 3, 150_000),
        "integers": lambda: rng.integers(0, 1000, 150_000).astype(float),
    }[dist]()
    d = TDigest.from_values(data, 200)
    assert len(d.means) <= 200 + 2
    assert _worst_rank_err(d, data) < 0.005
    s = np.sort(data)
    assert d.quantile(0.0) == s[0] and d.quantile(1.0) == s[-1]


def test_merge_associative_and_deterministic():
    rng = np.random.default_rng(3)
    parts = np.array_split(rng.normal(10, 5, 240_000), 31)
    ds = [TDigest.from_values(p, 200) for p in parts]
    m1 = TDigest.merge_all(ds)
    m2 = TDigest.merge_all(list(reversed(ds)))
    # merge is deterministic in the centroid MULTISET, not the order
    assert np.array_equal(m1.means, m2.means)
    assert np.array_equal(m1.weights, m2.weights)
    # grouped merge (tree shape) stays within the accuracy bound
    left = TDigest.merge_all(ds[:15])
    right = TDigest.merge_all(ds[15:])
    tree = left.merge(right)
    data = np.concatenate(parts)
    assert _worst_rank_err(tree, data) < 0.01
    assert tree.total == len(data)


def test_input_order_invariance():
    rng = np.random.default_rng(4)
    data = rng.uniform(0, 1, 50_000)
    a = TDigest.from_values(data, 100)
    b = TDigest.from_values(rng.permutation(data), 100)
    assert np.array_equal(a.means, b.means)
    assert np.array_equal(a.weights, b.weights)


def test_serde_roundtrip_and_empty():
    d = TDigest.from_values(np.arange(1000.0), 50)
    r = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(r.means, d.means)
    assert r.vmin == 0.0 and r.vmax == 999.0 and r.compression == 50
    e = TDigest.empty()
    assert np.isnan(e.quantile(0.5))
    m = TDigest.merge_all([e, d])
    assert m.total == 1000


def test_nan_values_dropped():
    v = np.array([1.0, np.nan, 3.0, np.nan, 2.0])
    d = TDigest.from_values(v, 100)
    assert d.total == 3 and d.vmin == 1.0 and d.vmax == 3.0


def test_mixed_compression_refused():
    a = TDigest.from_values([1.0, 2.0], 100)
    b = TDigest.from_values([3.0], 200)
    with pytest.raises(ValueError, match="mixed compression"):
        a.merge(b)


def test_spark_percentiles_sketch(spark):
    """One mapInPandas pass over events.value: per-partition digests,
    driver merge — estimates within the rank-error bound of the exact
    quantiles, deterministic across runs."""
    sf = "/root/testdata/sf0.01"
    df = spark.read.parquet(f"{sf}/events.parquet").repartition(8)
    qs = [0.05, 0.5, 0.95, 0.99]
    est, merged = percentiles_sketch(df, "value", qs, compression=200)
    vals = np.sort(
        df.select("value").toPandas()["value"].to_numpy(np.float64)
    )
    vals = vals[~np.isnan(vals)]
    n = len(vals)
    assert merged.total == n
    for q in qs:
        lo = np.searchsorted(vals, est[q], side="left")
        hi = np.searchsorted(vals, est[q], side="right")
        err = max(0.0, lo - q * n, q * n - hi) / n
        assert err < 0.01, (q, est[q], err)
    est2, merged2 = percentiles_sketch(df, "value", qs, compression=200)
    assert est == est2
    assert np.array_equal(merged.means, merged2.means)
