"""Hamming-LSH banding over packed Bloom vectors.

The reference's matcher is a full O(|D|·|R|) crosswise nested loop
(routers/match.py:54-67) — fine for an HTTP batch, impossible at 10^12
pages.  The scale path (BASELINE.json north_star) blocks candidates with
Hamming LSH: ``b`` bands of ``r`` sampled bit positions each; two vectors
collide in a band iff they agree on all r positions; collision probability
of a pair at Hamming similarity ``s`` is ``1-(1-s^r)^b``.  Banding turns
matching into an equi-join on ``(band, signature)`` — a shuffle hash join
Catalyst/AQE can plan, salt, and skew-split.

Everything is deterministic from the seed so retries and resumed runs
produce identical blocks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = ["LSHConfig", "band_positions", "band_signatures_udf", "add_band_signatures"]


@dataclass(frozen=True)
class LSHConfig:
    """``num_bands`` × ``band_width`` sampled bit positions, seeded."""
    num_bits: int
    num_bands: int = 32
    band_width: int = 16
    seed: int = 727

    def __post_init__(self):
        if not (1 <= self.band_width <= 62):
            raise ValueError("band_width must be in [1, 62] (signature packs into int64)")
        if self.num_bands < 1:
            raise ValueError("num_bands must be positive")
        if self.num_bits < 1:
            raise ValueError("num_bits must be positive")


def band_positions(cfg: LSHConfig) -> np.ndarray:
    """(num_bands, band_width) bit positions, deterministic from the seed."""
    rng = np.random.default_rng(cfg.seed)
    return rng.integers(0, cfg.num_bits, size=(cfg.num_bands, cfg.band_width), dtype=np.int64)


def band_signatures_udf(cfg: LSHConfig):
    """pandas UDF: packed bloom bytes → array<long> of band signatures.

    Vectorized across the Arrow batch: unpack all vectors into an
    (N, num_bits) bit matrix once, gather the sampled positions, and fold
    each band's r bits into an int64 with a power-of-two dot product.
    """
    positions = band_positions(cfg)
    weights = (np.int64(1) << np.arange(cfg.band_width, dtype=np.int64))
    n_bytes = (cfg.num_bits + 7) // 8

    @F.pandas_udf(ArrayType(LongType()))
    def _bands(blooms: pd.Series) -> pd.Series:
        raw = np.frombuffer(b"".join(blooms), dtype=np.uint8).reshape(len(blooms), n_bytes)
        bits = np.unpackbits(raw, axis=1, count=cfg.num_bits)
        # (N, num_bands, band_width) → (N, num_bands) int64 signatures
        sampled = bits[:, positions]
        sigs = sampled.astype(np.int64) @ weights
        return pd.Series(list(sigs))

    return _bands


def add_band_signatures(
    df: DataFrame,
    cfg: LSHConfig,
    bloom_col: str = "bloom",
    band_col: str = "band",
    sig_col: str = "sig",
) -> DataFrame:
    """Explode each record into ``num_bands`` (band, signature) rows.

    Output carries all input columns; the (band, sig) pair is the equi-join
    key for candidate generation.
    """
    udf = band_signatures_udf(cfg)
    return df.select(
        "*", F.posexplode(udf(F.col(bloom_col))).alias(band_col, sig_col)
    )
