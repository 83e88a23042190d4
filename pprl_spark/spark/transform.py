"""Transform stage: per-attribute string-transform chains as Arrow UDFs.

Reproduces the reference's `/transform` semantics (routers/transform.py:
111-155): for each attribute, apply the global ``before`` chain, then the
attribute's own chain, then the global ``after`` chain, with the
empty-value policy ignore/skip/error (``_try_transform`` 83-108).

Spark shape: one scalar pandas UDF per transformed attribute — a narrow
projection Catalyst fuses with downstream stages (no shuffle).  The
transforms themselves must stay byte-identical to the reference, so the
chain runs the kernel functions over each Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..config import TransformConfig, TransformerSpec
from ..kernels import transform as tk
from ..kernels.phonetics import PHONETIC_CODERS

__all__ = ["build_transformer", "build_attribute_chain", "transform"]


def build_transformer(spec: TransformerSpec):
    """Spec → str->str kernel fn (service registry routers/transform.py:61-80)."""
    if spec.name == "character_filter":
        return tk.character_filter(
            spec.characters if spec.characters is not None else tk.DEFAULT_FILTER_CHARACTERS
        )
    if spec.name == "normalization":
        return tk.normalize()
    if spec.name == "number":
        return tk.number(spec.decimal_places)
    if spec.name == "date_time":
        return tk.date_time(spec.input_format, spec.output_format)
    if spec.name == "mapping":
        return tk.mapping(dict(spec.mapping), spec.default_value, spec.inline)
    if spec.name == "phonetic_code":
        coder = PHONETIC_CODERS.get(spec.algorithm)
        if coder is None:
            raise ValueError(f"unimplemented phonetic code algorithm `{spec.algorithm}`")
        return tk.phonetic_code(coder)
    raise ValueError(f"unimplemented transformer `{spec.name}`")


def build_attribute_chain(cfg: TransformConfig, attr_name: str):
    """Composed chain for one attribute incl. the empty-value policy."""
    chain = [build_transformer(s) for s in cfg.global_before]
    for at in cfg.attribute_transformers:
        if at.attribute_name == attr_name:
            chain.extend(build_transformer(s) for s in at.transformers)
    chain.extend(build_transformer(s) for s in cfg.global_after)
    policy = cfg.empty_value

    def _apply_one(value: str) -> str:
        for fn in chain:
            if value == "":
                if policy == "error":
                    raise ValueError("entity contains empty field")
                if policy == "skip":
                    return value
            value = fn(value)
        return value

    return _apply_one


def transform(df: DataFrame, cfg: TransformConfig, attributes: list[str] | None = None) -> DataFrame:
    """Apply the configured chains to string columns of ``df``.

    ``attributes`` defaults to every column that has an attribute chain; a
    global before/after chain with no attribute list applies to all string
    columns, matching the reference's "every attribute on the entity"
    iteration.
    """
    if attributes is None:
        configured = [a.attribute_name for a in cfg.attribute_transformers]
        if configured:
            attributes = configured
        else:
            attributes = [name for name, dtype in df.dtypes if dtype == "string"]

    def _make_udf(chain_fn):
        @F.pandas_udf(StringType())
        def _udf(series: pd.Series) -> pd.Series:
            return series.map(lambda v: chain_fn(v) if v is not None else None)

        return _udf

    out = df
    for attr in attributes:
        out = out.withColumn(attr, _make_udf(build_attribute_chain(cfg, attr))(F.col(attr)))
    return out
