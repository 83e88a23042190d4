"""Digest chains and digest destructuring.

Parity targets:
* hash chain / HMAC chain — /root/reference/packages/pprl_service/
  pprl_service/routers/mask.py:22-84 (algorithms composed left→right,
  each stage digesting the previous stage's raw digest bytes).
* ``destructure_digest`` — /root/reference/packages/pprl_core/pprl_core/
  common.py:31-43 (first 16 bytes as four signed little-endian int32s).
"""

from __future__ import annotations

import hashlib
import hmac
import struct
from typing import Callable

__all__ = ["SUPPORTED_ALGORITHMS", "make_digest_fn", "destructure_digest"]

SUPPORTED_ALGORITHMS = {
    "md5": hashlib.md5,
    "sha1": hashlib.sha1,
    "sha256": hashlib.sha256,
    "sha512": hashlib.sha512,
}

DigestFn = Callable[[bytes], bytes]


def make_digest_fn(algorithms: list[str], key: str | None = None) -> DigestFn:
    """Compose a digest chain; with ``key`` set, every stage is HMAC'd."""
    try:
        ctors = [SUPPORTED_ALGORITHMS[a] for a in algorithms]
    except KeyError:
        raise ValueError(f"unimplemented hash function in `{'`, `'.join(algorithms)}`") from None
    if not ctors:
        raise ValueError("at least one hash algorithm is required")

    if key is None:
        def _digest(data: bytes) -> bytes:
            for ctor in ctors:
                data = ctor(data).digest()
            return data
    else:
        key_bytes = key.encode()

        def _digest(data: bytes) -> bytes:
            for ctor in ctors:
                data = hmac.digest(key_bytes, data, ctor)
            return data

    return _digest


def destructure_digest(digest: bytes) -> tuple[int, int, int, int]:
    """First 16 digest bytes → four signed little-endian int32s."""
    return struct.unpack_from("<iiii", digest)
