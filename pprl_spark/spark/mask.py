"""Mask stage: records → Bloom bit vectors as one narrow Arrow-UDF projection.

Spark shape (SURVEY.md §3.1): the whole encode is a single
``withColumn("bloom", udf(id, attr…))`` — no shuffle, partition-parallel,
Arrow batch boundaries replacing the reference's HTTP batch boundaries
(client batching at cli.py:103-104).  The UDF is deterministic: all
randomness is seeded from the broadcast config, so speculative/retried
tasks produce bit-identical output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from ..config import MaskConfig
from ..kernels.encode import BloomEncoder

__all__ = ["mask", "mask_b64"]


def _needed_columns(cfg: MaskConfig, attributes: list[str]) -> list[str]:
    """Encoded attributes plus any salt-source attributes."""
    cols = list(attributes)
    for a in cfg.attributes:
        if a.salt is not None and a.salt.attribute is not None and a.salt.attribute not in cols:
            cols.append(a.salt.attribute)
    return cols


def mask(
    df: DataFrame,
    cfg: MaskConfig,
    attributes: list[str],
    id_col: str = "id",
    output_col: str = "bloom",
) -> DataFrame:
    """``df[id, attrs…] → df[id, bloom BINARY]`` (packed MSB-first bytes).

    Parity: the reference's `/mask` endpoint (routers/mask.py:385-410) —
    CLK/CLKRBF/RBF encode + hardener chain; output bytes equal
    ``bitarray.tobytes()`` of the reference vector, so ``base64(bloom)``
    equals the reference's wire value.
    """
    cols = _needed_columns(cfg, attributes)
    # encoder is constructed per executor (lazily inside the UDF) from the
    # closure-captured config — cheap, and keeps the token memo per worker
    encoder_holder: list[BloomEncoder] = []

    @F.pandas_udf(BinaryType())
    def _encode(ids: pd.Series, *attr_series: pd.Series) -> pd.Series:
        if not encoder_holder:
            encoder_holder.append(BloomEncoder(cfg, attributes))
        encoder = encoder_holder[0]
        columns = {name: series.tolist() for name, series in zip(cols, attr_series)}
        return pd.Series(encoder.encode_batch(ids.tolist(), columns))

    return df.select(
        F.col(id_col),
        _encode(F.col(id_col), *[F.col(c) for c in cols]).alias(output_col),
    )


def mask_b64(
    df: DataFrame,
    cfg: MaskConfig,
    attributes: list[str],
    id_col: str = "id",
    output_col: str = "value",
) -> DataFrame:
    """Like :func:`mask` but with the reference's base64 wire encoding —
    the CSV mask sink shape (cli.py:60-93: columns ``id, value``)."""
    masked = mask(df, cfg, attributes, id_col=id_col, output_col="__bloom__")
    return masked.select(
        F.col(id_col),
        F.base64(F.col("__bloom__")).alias(output_col),
    )
