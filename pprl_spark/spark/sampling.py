"""Deterministic hash-based sampling and splits.

``df.sample()`` draws from a per-partition RNG: the result changes with
partitioning, task retries, and Spark versions — unusable for a
reproducible 100 TB training-data pipeline.  The standard remedy is
content-keyed hashing: a row is in the sample iff
``hash(key) mod M < fraction·M`` — stable under any partitioning, any
retry, any cluster size, and streamable (no count pass, no state).

The hash is the md5-derived lane used across the dedup family (one md5,
first 8 hex digits mod 2^31−1) — JVM-side, and bit-reproducible in the
DuckDB oracle, unlike xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_sample", "hash_split"]

_MOD = 2_147_483_647  # 2^31 − 1, matches dedup's md5 lane


def hash_bucket(key: Column | str, num_buckets: int = 1_000_000,
                salt: str = "") -> Column:
    """Deterministic bucket in [0, num_buckets) from a row key: md5 of
    (salt ∥ key), first 8 hex digits mod 2^31−1, mod num_buckets.  The
    ``salt`` decouples independent decisions (e.g. a sample drawn after
    a split must not correlate with the split)."""
    key = F.col(key) if isinstance(key, str) else key
    lane = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10
    ).cast("long") % F.lit(_MOD)
    # NULL keys propagate NULL (md5(NULL) → NULL) — callers get a NULL
    # bucket, NOT a silent assignment.  hash_sample's `<` predicate then
    # drops NULL-key rows; hash_split turns NULL buckets into a NULL
    # split index (ADVICE r3: previously every `when` was NULL and the
    # `otherwise` silently dumped NULL keys into the LAST split).
    return (lane % F.lit(num_buckets)).cast("int")


def hash_sample(df: DataFrame, key: Column | str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by the key hash — reproducible
    and partition-independent.  Same key ⇒ same decision, so sampling by
    a user/document id keeps entities intact (no half-sampled groups)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    buckets = 1_000_000
    return df.where(hash_bucket(key, buckets, salt) < int(fraction * buckets))


def hash_split(df: DataFrame, key: Column | str, weights: list[float],
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Append a deterministic split index column (0..len(weights)−1) with
    the given proportions — train/val/test splits that survive recompute,
    repartition, and incremental appends (a new row lands in the same
    split forever).

    A NULL key gets a NULL split index (consistent with ``hash_sample``,
    which drops NULL-key rows) — the caller must decide what a keyless
    row means; silently assigning it to a split would skew the last
    split's proportion (ADVICE r3)."""
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be non-negative and sum to 1, got {weights}")
    buckets = 1_000_000
    b = hash_bucket(key, buckets, salt)
    expr = None
    upper = 0.0
    for i, w in enumerate(weights[:-1]):
        upper += w
        cond = b < int(upper * buckets)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    expr = (F.lit(len(weights) - 1) if expr is None
            else expr.otherwise(len(weights) - 1))
    # guard BEFORE the otherwise-branch: a NULL bucket must not fall
    # through to the last split
    expr = F.when(b.isNull(), F.lit(None)).otherwise(expr)
    return df.withColumn(split_col, expr.cast("int"))
