"""Merging t-digest — the PercentileAgg scale path (reference
``solr/core/src/java/org/apache/solr/search/facet/PercentileAgg.java`` wraps
t-digest; algorithm: Dunning & Ertl, "Computing Extremely Accurate Quantiles
Using t-Digests", published/public).

This is the mergeable-sketch shape for Ray Data: each ``map_batches`` task
folds its batch into a small centroid array (partial), the driver or a tiny
reduce merges partials — quantiles over 10^12 rows shuffle kilobytes.
Deterministic: centroids are merged in sorted order with the k1 scale
function's size bound; same inputs (any partitioning) give bit-identical
merged digests after the final compress."""

from __future__ import annotations

import numpy as np

COMPRESSION = 200.0


def _compress(means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge honoring the k1 size bound."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = [float(means[0])]
    out_w: list[float] = [float(weights[0])]
    w_so_far = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_so_far / total
        q2 = (w_so_far + out_w[-1] + w) / total
        # k1 scale: max centroid weight ~ 4 n q(1-q) / compression
        limit = 4.0 * total * max(q0 * (1 - q0), (1 - q2) * q2) / COMPRESSION + 1.0
        if out_w[-1] + w <= limit:
            nw = out_w[-1] + w
            out_m[-1] = (out_m[-1] * out_w[-1] + m * w) / nw
            out_w[-1] = nw
        else:
            w_so_far += out_w[-1]
            out_m.append(float(m))
            out_w.append(float(w))
    return np.array(out_m), np.array(out_w)


class TDigest:
    __slots__ = ("means", "weights")

    def __init__(self, means=None, weights=None):
        self.means = np.zeros(0) if means is None else np.asarray(means, dtype=np.float64)
        self.weights = np.zeros(0) if weights is None else np.asarray(weights, dtype=np.float64)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        self.means, self.weights = _compress(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, np.ones(len(v))]),
        )
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means, self.weights = _compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        arr = np.frombuffer(b, dtype="<f8")
        n = len(arr) // 2
        return cls(arr[:n].copy(), arr[n:].copy())
