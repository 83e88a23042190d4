"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``BINARY`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
``mapInPandas`` stages (Arrow batches of raw bytes in, fixed-schema
features out).  The codec libraries are not available in this container,
so the *decode* step is stubbed: ``decoder="stub"`` derives deterministic
fake features from the payload bytes (so the distributed plumbing —
schema, batching, partitioning — is fully real and testable), while
``decoder="real"`` raises ``NotImplementedError`` with the intended
integration point.

At scale this stage is embarrassingly parallel and CPU-bound: size
partitions by payload bytes (``spark.sql.files.maxPartitionBytes``), never
collect payloads, and prune the binary column before any shuffle that
doesn't need it (Catalyst column pruning does this automatically when the
select list omits it).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["decode_image_features", "sample_frames"]

_IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, sha256 string, embedding array<float>"
)


def _stub_image_features(payload: bytes, embedding_dim: int) -> dict:
    """Deterministic fake decode: dimensions and an 'embedding' derived
    from the payload digest.  NOT a real decoder — the real one plugs in
    here (PIL/libvips/ffmpeg), keeping the same output schema."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "n_channels": 3,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "embedding": rng.standard_normal(embedding_dim).astype(np.float32).tolist(),
    }


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    embedding_dim: int = 16,
    decoder: str = "stub",
) -> DataFrame:
    """Binary image column → typed feature rows via mapInPandas."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decoding requires PIL/libvips, not present in this "
            "environment; wire the decoder into _stub_image_features's slot"
        )
    if decoder != "stub":
        raise ValueError(f"unknown decoder `{decoder}`")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                feats = _stub_image_features(bytes(payload), embedding_dim)
                rows.append({"doc_id": int(doc_id), **feats})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_IMAGE_FEATURE_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_sha256 string"


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row per
    sampled 'frame' (deterministic byte-offset slices in the stub)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for idx in range(n):
                    chunk = payload[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_sample, schema=_FRAME_SCHEMA)
