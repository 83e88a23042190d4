"""HyperLogLog (dense, 64-bit hash variant).

Flajolet, Fusy, Gandouet, Meunier 2007; the 64-bit-hash adaptation
(Heule et al. 2013) removes the large-range correction.  Relative error
σ ≈ 1.04/√m with m = 2^p registers.

Merge = element-wise register max → exactly associative/commutative:
states are bit-identical for any partitioning of the same multiset.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import pack_header, read_header, register_sketch

__all__ = ["HyperLogLog"]


def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (two exact 32-bit halves;
    32-bit ints are exact in float64, so frexp gives exact bit lengths)."""
    hi = (v >> np.uint64(32)).astype(np.float64)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, hi_bl = np.frexp(hi)
    _, lo_bl = np.frexp(lo)
    return np.where(hi > 0, 32 - hi_bl, 64 - lo_bl).astype(np.int64)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@register_sketch(1)
class HyperLogLog:
    INPUT = "hash"  # update() consumes pre-hashed uint64 vs raw float64

    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError("precision p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @property
    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def update(self, hashes) -> None:
        """``hashes``: int64/uint64 array of pre-hashed values."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        rank = np.minimum(_clz64(rest) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError(f"cannot merge HLL(p={self.p}) with HLL(p={other.p})")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = _alpha(m) * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)  # linear counting
        return float(raw)

    def serialize(self) -> bytes:
        return pack_header(self.TYPE_ID) + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        _, _, off = read_header(data)
        (p,) = struct.unpack_from("<B", data, off)
        sk = cls(p)
        sk.registers = np.frombuffer(data, dtype=np.uint8, offset=off + 1, count=sk.m).copy()
        return sk
