"""Bloom filter as a mergeable sketch.

Standard FPR bound (1 − e^{−kn/m})^k; sizing can reuse the reference's
``optimal_size`` fill-rate semantics (pprl_core bits.py:127-145 parity
lives in :func:`pprl_spark.kernels.bits.optimal_size`).  Positions come
from one 64-bit hash via Kirsch–Mitzenmacher, matching the sketch-layer
convention (this is the membership sketch, distinct from the PPRL CLK
encoder which must replay the reference's digest scheme bit-for-bit).

Merge = bitwise OR → exactly associative/commutative.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import pack_header, read_header, register_sketch

__all__ = ["BloomFilter"]


@register_sketch(3)
class BloomFilter:
    INPUT = "hash"  # update() consumes pre-hashed uint64 vs raw float64

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 5):
        if num_bits <= 0 or num_hashes <= 0:
            raise ValueError("num_bits and num_hashes must be positive")
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.buf = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
        self.n_inserted = 0

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h2 = (h >> np.uint64(32)).astype(np.int64)
        j = np.arange(self.num_hashes, dtype=np.int64)[:, None]
        return (h1[None, :] + j * h2[None, :] + j * j) % self.num_bits

    def update(self, hashes) -> None:
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.buf, pos >> 3, (0x80 >> (pos & 7)).astype(np.uint8))
        self.n_inserted += int(h.size)

    def contains(self, hashes) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64)
        pos = self._positions(h)
        set_ = (self.buf[pos >> 3] & (0x80 >> (pos & 7)).astype(np.uint8)) != 0
        return set_.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.num_bits, other.num_hashes) != (self.num_bits, self.num_hashes):
            raise ValueError("cannot merge bloom filters with different shapes")
        np.bitwise_or(self.buf, other.buf, out=self.buf)
        self.n_inserted += other.n_inserted
        return self

    def expected_fpr(self) -> float:
        return (1 - math.exp(-self.num_hashes * self.n_inserted / self.num_bits)) ** self.num_hashes

    def estimate(self) -> float:
        """Cardinality estimate from fill rate: −m/k · ln(1 − X/m)."""
        set_bits = int(np.unpackbits(self.buf, count=self.num_bits).sum())
        if set_bits >= self.num_bits:
            return float("inf")
        return -self.num_bits / self.num_hashes * math.log(1 - set_bits / self.num_bits)

    def serialize(self) -> bytes:
        head = pack_header(self.TYPE_ID) + struct.pack("<QIq", self.num_bits, self.num_hashes, self.n_inserted)
        return head + self.buf.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        _, _, off = read_header(data)
        num_bits, num_hashes, n_ins = struct.unpack_from("<QIq", data, off)
        sk = cls(num_bits, num_hashes)
        sk.n_inserted = n_ins
        sk.buf = np.frombuffer(data, dtype=np.uint8, offset=off + 20, count=(num_bits + 7) // 8).copy()
        return sk
