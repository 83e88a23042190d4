"""Count-min sketch (Cormode & Muthukrishnan 2005).

Point-query overcount ≤ ε·N with probability ≥ 1−δ for width w = ⌈e/ε⌉ and
depth d = ⌈ln(1/δ)⌉.  The d row positions per item are derived from one
64-bit hash with the Kirsch–Mitzenmacher double-hashing construction
(h1 + j·h2 mod w), so no per-row re-hashing is needed.

Merge = element-wise add → exactly associative/commutative.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import pack_header, read_header, register_sketch

__all__ = ["CountMinSketch"]


@register_sketch(2)
class CountMinSketch:
    INPUT = "hash"  # update() consumes pre-hashed uint64 vs raw float64

    def __init__(self, width: int = 2719, depth: int = 5):
        if width <= 0 or depth <= 0:
            raise ValueError("width and depth must be positive")
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    @classmethod
    def from_error(cls, epsilon: float, delta: float) -> "CountMinSketch":
        return cls(width=int(math.ceil(math.e / epsilon)), depth=int(math.ceil(math.log(1 / delta))))

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) table positions via Kirsch–Mitzenmacher."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h2 = (h >> np.uint64(32)).astype(np.int64)
        j = np.arange(self.depth, dtype=np.int64)[:, None]
        # +j*j*h2 guards against h2==0 collapsing all rows to one position
        return (h1[None, :] + j * h2[None, :] + j * j) % self.width

    def update(self, hashes, counts=None) -> None:
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return
        pos = self._positions(h)
        if counts is None:
            counts = np.ones(h.shape[0], dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        for j in range(self.depth):
            np.add.at(self.table[j], pos[j], counts)
        self.total += int(counts.sum())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge count-min sketches with different shapes")
        self.table += other.table
        self.total += other.total
        return self

    def estimate(self, hashes=None):
        """Point query: min over the d counters.  With no argument, returns
        the total item count (exact)."""
        if hashes is None:
            return self.total
        h = np.asarray(hashes, dtype=np.int64)
        pos = self._positions(h)
        ests = np.stack([self.table[j, pos[j]] for j in range(self.depth)])
        return ests.min(axis=0)

    def serialize(self) -> bytes:
        head = pack_header(self.TYPE_ID) + struct.pack("<IIq", self.width, self.depth, self.total)
        return head + self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMinSketch":
        _, _, off = read_header(data)
        width, depth, total = struct.unpack_from("<IIq", data, off)
        sk = cls(width, depth)
        sk.total = total
        sk.table = (
            np.frombuffer(data, dtype=np.int64, offset=off + 16, count=width * depth)
            .reshape(depth, width)
            .copy()
        )
        return sk
