"""Theta sketch (bottom-k / KMV variant) — distinct counting with SET
OPERATIONS (union / intersection), which HLL cannot express.

Bar-Yossef et al. 2002 (k minimum values); Dasgupta, Lang, Rhodes,
Thaler 2016 ("A Framework for Estimating Stream Expression
Cardinalities" — the theta-sketch framework).  The sample is the k
smallest distinct 64-bit hashes; θ = the k-th minimum normalized to
(0, 1] is the effective sampling rate.

* estimate: exact while |sample| < k (θ = 1); else (k-1)/θ — the
  unbiased KMV estimator, RSE ≈ 1/√(k−2).
* union: k smallest of the combined samples — "k smallest of a set
  union" is associative/commutative and produces BIT-IDENTICAL states
  for any partitioning of the same multiset (same property the batch
  layer asserts for HLL).
* intersection: both samples are uniform below min(θ_a, θ_b), so
  |S_a ∩ S_b ∩ {h < θ}| / θ estimates |A ∩ B| (theta framework §3);
  the RSE grows as the Jaccard similarity shrinks — documented, and the
  assertion-shaped driver query checks the realized error.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import pack_header, read_header, register_sketch

__all__ = ["ThetaSketch"]

_TWO64 = float(1 << 64)


@register_sketch(6)
class ThetaSketch:
    INPUT = "hash"

    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be at least 16")
        self.k = k
        self.values = np.empty(0, dtype=np.uint64)  # sorted, distinct

    @property
    def relative_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 2)

    @property
    def theta(self) -> float:
        """Inclusion threshold as a fraction of the hash space (1.0 while
        the sample is not yet full — every hash is retained)."""
        if self.values.shape[0] < self.k:
            return 1.0
        return float(self.values[self.k - 1]) / _TWO64

    def update(self, hashes) -> None:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        if h.size == 0:
            return
        merged = np.union1d(self.values, h)  # sorted + distinct
        self.values = merged[: self.k]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError(f"cannot merge Theta(k={self.k}) with Theta(k={other.k})")
        merged = np.union1d(self.values, other.values)
        self.values = merged[: self.k]
        return self

    def estimate(self) -> float:
        n = self.values.shape[0]
        if n < self.k:
            return float(n)
        return (self.k - 1) / self.theta

    def estimate_intersection(self, other: "ThetaSketch") -> float:
        """Estimate |A ∩ B| from two sketches over the same hash space."""
        theta = min(self.theta, other.theta)
        bound = np.uint64(min(int(theta * _TWO64), (1 << 64) - 1))
        a = self.values[self.values < bound] if theta < 1.0 else self.values
        b = other.values[other.values < bound] if theta < 1.0 else other.values
        common = np.intersect1d(a, b).shape[0]
        return common / theta

    def estimate_union(self, other: "ThetaSketch") -> float:
        clone = ThetaSketch(self.k)
        clone.values = self.values.copy()
        return clone.merge(other).estimate()

    def serialize(self) -> bytes:
        return (
            pack_header(self.TYPE_ID)
            + struct.pack("<II", self.k, self.values.shape[0])
            + self.values.astype("<u8").tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "ThetaSketch":
        _, _, off = read_header(data)
        k, n = struct.unpack_from("<II", data, off)
        sk = cls(k)
        sk.values = np.frombuffer(
            data, dtype="<u8", count=n, offset=off + 8
        ).astype(np.uint64)
        return sk
