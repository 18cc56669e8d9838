"""Deterministic mergeable t-digest — the scale path for quantiles.

``percentiles_agg`` (plans/sketch_queries.py) computes exact quantiles,
which at 100 TB means a full sort or a two-pass selection.  The
t-digest (Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", public algorithm) is the ES `percentiles` aggregation's
sketch: each partition compresses its values into O(compression)
centroids (one pass over sorted values), the per-partition digests are
merged associatively, and any quantile is answered from the merged
centroid set with rank error O(q·(1-q)/compression) — tails near-exact,
min/max exact.

This implementation is the MERGING digest with the k1 scale function
k(q) = δ/2π · asin(2q−1) and is fully DETERMINISTIC: values are sorted
before clustering (stable), merges concatenate-sort-recompress, no
randomness — the same multiset through the same partitioning always
yields byte-identical centroids, which keeps the engine's
rank-identity discipline testable.

Spark shape: ``percentiles_sketch(df, col, ...)`` runs one
``mapInPandas`` pass emitting ONE serialized digest row per partition
(bytes ∝ compression, not rows), then merges the P digests on the
driver — map-side combine with a constant-size shuffle, the same shape
as the HLL cardinality agg.  No sort, no full-column collect.
"""

from __future__ import annotations

import math

import numpy as np

_TAU = 2.0 * math.pi


class TDigest:
    """Immutable-ish centroid set sorted by mean."""

    __slots__ = ("means", "weights", "vmin", "vmax", "compression")

    def __init__(
        self,
        means: np.ndarray,
        weights: np.ndarray,
        vmin: float,
        vmax: float,
        compression: float = 200.0,
    ):
        self.means = np.asarray(means, np.float64)
        self.weights = np.asarray(weights, np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self.compression = float(compression)

    # ------------------------------------------------------ build

    @classmethod
    def empty(cls, compression: float = 200.0) -> "TDigest":
        return cls(
            np.empty(0), np.empty(0), math.inf, -math.inf, compression
        )

    @classmethod
    def from_values(
        cls, values, compression: float = 200.0
    ) -> "TDigest":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return cls.empty(compression)
        v = np.sort(v)
        m, w = _compress(v, np.ones(len(v)), compression)
        return cls(m, w, float(v[0]), float(v[-1]), compression)

    @property
    def total(self) -> float:
        return float(self.weights.sum()) if len(self.weights) else 0.0

    # ------------------------------------------------------ merge

    @classmethod
    def merge_all(cls, digests: list) -> "TDigest":
        """Associative merge: concatenate centroids, sort by mean
        (stable), recompress once.  Deterministic for any grouping of
        the same centroid multiset."""
        ds = [d for d in digests if len(d.means)]
        if not ds:
            comp = digests[0].compression if digests else 200.0
            return cls.empty(comp)
        comp = ds[0].compression
        if any(d.compression != comp for d in ds):
            raise ValueError("cannot merge digests of mixed compression")
        m = np.concatenate([d.means for d in ds])
        w = np.concatenate([d.weights for d in ds])
        order = np.argsort(m, kind="stable")
        m, w = _compress(m[order], w[order], comp)
        return cls(
            m,
            w,
            min(d.vmin for d in ds),
            max(d.vmax for d in ds),
            comp,
        )

    def merge(self, other: "TDigest") -> "TDigest":
        return TDigest.merge_all([self, other])

    # ---------------------------------------------------- quantile

    def quantile(self, q: float) -> float:
        """Estimate the q-quantile (0 ≤ q ≤ 1) by linear interpolation
        between centroid means; exact at the extremes."""
        if not len(self.means):
            return math.nan
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q out of [0,1]: {q}")
        n = self.total
        if q <= 0.5 / n:
            return self.vmin
        if q >= 1.0 - 0.5 / n:
            return self.vmax
        target = q * n
        # centroid i spans cumulative ranks centered at
        # cum_i = sum(w[:i]) + w[i]/2
        cum = np.cumsum(self.weights) - self.weights / 2.0
        i = int(np.searchsorted(cum, target))
        if i == 0:
            lo_r, lo_v = 0.5, self.vmin
            hi_r, hi_v = cum[0], self.means[0]
        elif i >= len(cum):
            lo_r, lo_v = cum[-1], self.means[-1]
            hi_r, hi_v = n - 0.5, self.vmax
        else:
            lo_r, lo_v = cum[i - 1], self.means[i - 1]
            hi_r, hi_v = cum[i], self.means[i]
        if hi_r <= lo_r:
            return float(hi_v)
        t = (target - lo_r) / (hi_r - lo_r)
        return float(lo_v + t * (hi_v - lo_v))

    # --------------------------------------------------- transport

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.compression, self.vmin, self.vmax, len(self.means)],
            np.float64,
        )
        return b"".join(
            [
                head.tobytes(),
                self.means.astype(np.float64).tobytes(),
                self.weights.astype(np.float64).tobytes(),
            ]
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        head = np.frombuffer(b[:32], np.float64)
        comp, vmin, vmax, k = head
        k = int(k)
        m = np.frombuffer(b[32 : 32 + 8 * k], np.float64).copy()
        w = np.frombuffer(b[32 + 8 * k : 32 + 16 * k], np.float64).copy()
        return cls(m, w, vmin, vmax, comp)


def _k1(q: float, comp: float) -> float:
    return comp / _TAU * math.asin(2.0 * min(max(q, 0.0), 1.0) - 1.0)


def _q_limit(q0: float, comp: float) -> float:
    """The largest q a cluster starting at cumulative fraction q0 may
    extend to: k(q_limit) = k(q0) + 1."""
    k = _k1(q0, comp) + 1.0
    if k >= comp / 4.0:  # asin domain guard
        return 1.0
    return 0.5 * (math.sin(_TAU * k / comp) + 1.0)


def _compress(
    means: np.ndarray, weights: np.ndarray, comp: float
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right clustering of mean-sorted (means, weights)
    under the k1 size limit — the MergingDigest compaction, fully
    deterministic."""
    total = float(weights.sum())
    out_m: list = []
    out_w: list = []
    cur_m = float(means[0])
    cur_w = float(weights[0])
    w_before = 0.0  # weight fully to the left of the open cluster
    q_limit = _q_limit(0.0, comp)
    for i in range(1, len(means)):
        w = float(weights[i])
        if (w_before + cur_w + w) / total <= q_limit:
            # weighted-mean update keeps the centroid exact
            cur_m += (float(means[i]) - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            q_limit = _q_limit(w_before / total, comp)
            cur_m, cur_w = float(means[i]), w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


# -------------------------------------------------------- Spark entry


def percentiles_sketch(
    df,
    col: str,
    qs: list,
    compression: float = 200.0,
):
    """Approximate percentiles of ``df[col]`` via per-partition
    t-digests: one mapInPandas pass emits ONE digest row per partition
    (O(compression) bytes), the driver merges P digests and answers
    every quantile — no sort, no shuffle proportional to rows.

    Returns ``(estimates: dict[q -> value], merged: TDigest)``.
    """
    import pandas as pd

    def per_part(it):
        vals = []
        for pdf in it:
            v = pdf[col].to_numpy(np.float64)
            vals.append(v[~np.isnan(v)])
        arr = (
            np.concatenate(vals) if vals else np.empty(0, np.float64)
        )
        if not len(arr):
            return
        d = TDigest.from_values(arr, compression)
        yield pd.DataFrame({"digest": [d.to_bytes()]})

    rows = (
        df.select(df[col].cast("double").alias(col))
        .mapInPandas(per_part, schema="digest binary")
        .collect()
    )
    digests = [TDigest.from_bytes(bytes(r["digest"])) for r in rows]
    merged = (
        TDigest.merge_all(digests)
        if digests
        else TDigest.empty(compression)
    )
    return {q: merged.quantile(q) for q in qs}, merged
