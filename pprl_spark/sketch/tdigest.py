"""t-digest (Dunning & Ertl 2019, merging variant).

Quantile error is tail-weighted: centroid sizes are bounded by the k1
scale function k(q) = (δ/2π)·asin(2q−1), so centroids near q∈{0,1} stay
tiny while the middle coarsens.  Gate (BASELINE.md): |rank error| ≤ 0.01
at the median, tighter at the tails, for δ = 100.

Merge concatenates centroid lists and re-compresses — associative and
commutative up to interpolation error; estimates are the merge-invariance
contract.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import pack_header, read_header, register_sketch

__all__ = ["TDigest"]


@register_sketch(5)
class TDigest:
    INPUT = "value"  # update() consumes pre-hashed uint64 vs raw float64

    _BUFFER_FACTOR = 5

    def __init__(self, compression: float = 100.0):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[float] = []
        self.n = 0.0

    # ---- scale function k1 and its inverse ----

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2 * math.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def update(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self._buf.extend(vals.tolist())
        self.n += float(vals.size)
        if len(self._buf) >= self._BUFFER_FACTOR * self.compression:
            self._compress()

    def _compress(self) -> None:
        if not self._buf and self.means.size <= self.compression:
            return
        means = np.concatenate([self.means, np.asarray(self._buf, dtype=np.float64)])
        weights = np.concatenate(
            [self.weights, np.ones(len(self._buf), dtype=np.float64)]
        )
        self._buf = []
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()

        out_means: list[float] = []
        out_weights: list[float] = []
        cur_mean, cur_weight = means[0], weights[0]
        w_before = 0.0  # weight fully to the left of the current centroid
        for i in range(1, means.size):
            q_left = w_before / total
            q_right = (w_before + cur_weight + weights[i]) / total
            if self._k(np.array([q_right]))[0] - self._k(np.array([q_left]))[0] <= 1.0:
                new_w = cur_weight + weights[i]
                cur_mean += (means[i] - cur_mean) * weights[i] / new_w
                cur_weight = new_w
            else:
                out_means.append(cur_mean)
                out_weights.append(cur_weight)
                w_before += cur_weight
                cur_mean, cur_weight = means[i], weights[i]
        out_means.append(cur_mean)
        out_weights.append(cur_weight)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("cannot merge t-digests with different compression")
        other._compress()
        self._compress()
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        if not (0 <= q <= 1):
            raise ValueError("q must be in [0, 1]")
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        idx = int(np.searchsorted(cum, target) - 1)
        span = cum[idx + 1] - cum[idx]
        frac = (target - cum[idx]) / span if span > 0 else 0.0
        return float(self.means[idx] + frac * (self.means[idx + 1] - self.means[idx]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def estimate(self):
        return self.quantile(0.5)

    def serialize(self) -> bytes:
        self._compress()
        head = pack_header(self.TYPE_ID) + struct.pack(
            "<ddI", self.compression, self.n, self.means.size
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        _, _, off = read_header(data)
        compression, n, size = struct.unpack_from("<ddI", data, off)
        off += 20
        sk = cls(compression)
        sk.n = n
        sk.means = np.frombuffer(data, dtype=np.float64, offset=off, count=size).copy()
        sk.weights = np.frombuffer(
            data, dtype=np.float64, offset=off + 8 * size, count=size
        ).copy()
        return sk
