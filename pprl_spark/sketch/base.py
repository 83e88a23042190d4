"""Sketch protocol + binary serialization framing.

All sketches are **mergeable**: ``merge`` is associative and commutative,
so Spark can aggregate them with the classic two-phase pattern
(partition-local partial → shuffle of KB-sized states → final merge) —
see :mod:`pprl_spark.sketch.spark_agg`.

Serialized layout: ``magic(4s) | type(1B) | version(1B)`` header followed
by a type-specific payload.  States are plain ``bytes`` so they live in
``BINARY`` DataFrame columns and parquet checkpoints.

Update inputs are *pre-hashed* uint64 values for the hash-based sketches
(HLL / CMS / Bloom) — the Spark layer computes them JVM-side with
``F.xxhash64`` so no Python-side string hashing sits in the hot path —
and raw float64 values for the rank sketches (KLL / t-digest).
"""

from __future__ import annotations

import struct
from typing import Protocol, runtime_checkable

__all__ = ["Sketch", "MAGIC", "pack_header", "read_header", "deserialize", "register_sketch"]

MAGIC = b"PSK1"

_REGISTRY: dict[int, type] = {}


def register_sketch(type_id: int):
    def _wrap(cls):
        cls.TYPE_ID = type_id
        _REGISTRY[type_id] = cls
        return cls

    return _wrap


def pack_header(type_id: int, version: int = 1) -> bytes:
    return MAGIC + struct.pack("<BB", type_id, version)


def read_header(data: bytes) -> tuple[int, int, int]:
    """→ (type_id, version, payload_offset)."""
    if data[:4] != MAGIC:
        raise ValueError("not a pprl_spark sketch state")
    type_id, version = struct.unpack_from("<BB", data, 4)
    return type_id, version, 6


def deserialize(data: bytes) -> "Sketch":
    type_id, _version, _off = read_header(data)
    cls = _REGISTRY.get(type_id)
    if cls is None:
        raise ValueError(f"unknown sketch type id {type_id}")
    return cls.deserialize(data)


@runtime_checkable
class Sketch(Protocol):
    def update(self, values) -> None: ...
    def merge(self, other: "Sketch") -> "Sketch": ...
    def serialize(self) -> bytes: ...
    def estimate(self): ...
