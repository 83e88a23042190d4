"""Misra–Gries frequent-items ("heavy hitters") sketch.

The classic deterministic counter summary (Misra & Gries 1982) in its
MERGEABLE form (Agarwal, Cormode, Huang, Phillips, Wei, Yi —
"Mergeable Summaries", PODS 2012): keep at most ``capacity`` (item,
count) pairs; when a combine step exceeds capacity, subtract the
(capacity+1)-th largest count from every counter and drop the
non-positive ones, accumulating the subtraction into a global
``offset``.  Invariants after any sequence of updates/merges over a
stream of ``total`` items:

* ``count(x)  ≤ true(x) ≤ count(x) + offset`` for every tracked x,
  and ``true(x) ≤ offset`` for every untracked x;
* ``offset ≤ total / (capacity + 1)`` — so every item with frequency
  above ``total/(capacity+1)`` is guaranteed present (the ε-heavy
  hitters for ε = 1/(capacity+1)).

Merging is closed under the same bound, so the two-phase Spark pattern
(per-partition partials → tiny-state merge, spark_agg.py) applies
unchanged.  Unlike the hash sketches this summary must RETURN the
items, so its Spark input is the raw (string) column — ``INPUT =
"raw"`` — not an xxhash64.

Determinism note: counts and ``offset`` are exact-deterministic only in
the EXACT regime (distinct items ≤ capacity: no decrements, counts are
true counts regardless of partitioning).  In the compressed regime the
(count, offset) pairs depend on merge order — the BOUNDS above hold for
every order, but bit-identity across parallelism levels is only
guaranteed in the exact regime (property-tested both ways).

Reference parity: the reference has no sketch library; this fills the
frequency-rank slot of the standard sketch families (alongside
HLL/CMS/KLL/t-digest/theta/bloom) per the north rule.
"""

from __future__ import annotations

import struct

from .base import pack_header, read_header, register_sketch

__all__ = ["FrequentItemsSketch"]


@register_sketch(7)
class FrequentItemsSketch:
    INPUT = "raw"  # update() consumes raw items (strings), not hashes

    def __init__(self, capacity: int = 64):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = int(capacity)
        self.counters: dict[str, int] = {}
        self.offset = 0
        self.total = 0

    # ------------------------------------------------------------ core
    def _compress(self) -> None:
        """Enforce ``len(counters) <= capacity`` by the MG decrement."""
        if len(self.counters) <= self.capacity:
            return
        # (capacity+1)-th largest count = the amount to subtract
        counts = sorted(self.counters.values(), reverse=True)
        m = counts[self.capacity]
        self.counters = {
            item: c - m for item, c in self.counters.items() if c > m
        }
        self.offset += m

    def update(self, items, counts=None) -> None:
        """Add a batch of items (any iterable of str/None; None skipped).
        ``counts`` optionally weights each item."""
        if counts is None:
            for it in items:
                if it is None:
                    continue
                it = str(it)
                self.counters[it] = self.counters.get(it, 0) + 1
                self.total += 1
        else:
            for it, c in zip(items, counts):
                if it is None:
                    continue
                c = int(c)
                if c <= 0:
                    continue
                it = str(it)
                self.counters[it] = self.counters.get(it, 0) + c
                self.total += c
        self._compress()

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        if other.capacity != self.capacity:
            raise ValueError(
                "cannot merge frequent-items sketches with different capacities"
            )
        for item, c in other.counters.items():
            self.counters[item] = self.counters.get(item, 0) + c
        self.offset += other.offset
        self.total += other.total
        self._compress()
        return self

    # --------------------------------------------------------- queries
    def estimate(self, item: str | None = None):
        """Point query → (lower, upper) bounds for one item; or, with no
        argument, the full summary as a list of ``(item, lower, upper)``
        sorted by lower bound descending then item (deterministic)."""
        if item is not None:
            lo = self.counters.get(str(item), 0)
            return (lo, lo + self.offset)
        return [
            (item, c, c + self.offset)
            for item, c in sorted(
                self.counters.items(), key=lambda kv: (-kv[1], kv[0])
            )
        ]

    def heavy_hitters(self, threshold_fraction: float | None = None):
        """NO-FALSE-NEGATIVE candidate set: every item whose true count
        could exceed ``threshold_fraction·total`` (upper-bound test — a
        true heavy hitter is never missing; an item is a *guaranteed*
        hitter when its LOWER bound also clears the cut).  Default
        threshold is the sketch's own error level 1/(capacity+1)."""
        if threshold_fraction is None:
            threshold_fraction = 1.0 / (self.capacity + 1)
        cut = threshold_fraction * self.total
        return [
            (item, lo, hi)
            for item, lo, hi in self.estimate()
            if hi > cut
        ]

    @property
    def error_bound(self) -> int:
        """Max undercount of any tracked item (== max count of any
        untracked item); ≤ total/(capacity+1) by the MG invariant."""
        return self.offset

    # --------------------------------------------------- serialization
    def serialize(self) -> bytes:
        head = pack_header(self.TYPE_ID) + struct.pack(
            "<IqqI", self.capacity, self.offset, self.total, len(self.counters)
        )
        parts = [head]
        for item, c in self.counters.items():
            raw = item.encode("utf-8")
            parts.append(struct.pack("<qI", c, len(raw)) + raw)
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes) -> "FrequentItemsSketch":
        _, _, off = read_header(data)
        capacity, offset, total, n = struct.unpack_from("<IqqI", data, off)
        off += 24
        sk = cls(capacity)
        sk.offset = offset
        sk.total = total
        for _ in range(n):
            c, ln = struct.unpack_from("<qI", data, off)
            off += 12
            sk.counters[data[off : off + ln].decode("utf-8")] = c
            off += ln
        return sk
