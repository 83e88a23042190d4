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

__all__ = ["hash_bucket", "hash_sample", "hash_split", "stratified_sample"]

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


def stratified_sample(
    df: DataFrame,
    group_col: Column | str,
    key: Column | str,
    k: int,
    salt: str = "",
    rank_col: str = "sample_rank",
    _margin: float | None = None,
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen and ORDERED by
    the content-keyed md5 lane — the balanced-per-stratum sample (k docs
    per language/domain) that survives recompute, repartition, and
    retries.  Appends ``rank_col`` (1..k within the group, lane order).

    Semantics: rank rows within each group by ``(lane(key), key)`` and
    keep rank <= k.  The IMPLEMENTATION avoids sorting whole groups at
    scale: group sizes are a hash aggregate (broadcast back), a map-side
    lane threshold with a +4σ+16 margin pre-filters each group to ~k
    candidates, and only the candidates are window-sorted.  Groups where
    the binomial tail bites anyway (survivors < min(k, n)) fall back to
    a full window — detected with a lazy aggregate, so the common case
    stays one scan + one k-sized sort per group, and the result is
    EXACT either way (the fallback is a correctness net, not an
    approximation).  NULL group or key rows are dropped (consistent
    with ``hash_sample``'s NULL policy).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    group_col = F.col(group_col) if isinstance(group_col, str) else group_col
    keyc = F.col(key) if isinstance(key, str) else key
    from pyspark.sql import Window

    buckets = _MOD
    lane = hash_bucket(keyc, buckets, salt)
    base = (
        df.where(group_col.isNotNull() & keyc.isNotNull())
        .withColumn("__lane", lane)
        .withColumn("__grp", group_col)
    )
    sizes = base.groupBy("__grp").agg(F.count(F.lit(1)).alias("__n"))
    # _margin override exists to force the shortfall fallback in tests
    margin = _margin if _margin is not None else k + 4 * (k ** 0.5) + 16
    sized = base.join(F.broadcast(sizes), "__grp")
    thresh = F.least(
        F.lit(buckets),
        F.ceil(F.lit(float(buckets)) * F.lit(margin) / F.col("__n")).cast("long"),
    )
    cand = sized.where(F.col("__lane") < thresh)

    win = Window.partitionBy("__grp").orderBy("__lane", keyc.cast("string"))
    ranked = cand.withColumn(rank_col, F.row_number().over(win))

    # correctness net: a group is short iff its candidate pool is
    # smaller than min(k, n) — rerank those groups over ALL their rows.
    # Anchor on `sizes` (LEFT join), not on the candidate aggregate: a
    # group whose pre-filter kept ZERO rows has no candidate-count row
    # at all and must still be detected.
    short = (
        sizes.join(
            cand.groupBy("__grp").agg(F.count(F.lit(1)).alias("__c")),
            "__grp",
            "left",
        )
        .where(
            F.coalesce(F.col("__c"), F.lit(0))
            < F.least(F.lit(k), F.col("__n"))
        )
        .select("__grp")
    )
    ok = ranked.join(F.broadcast(short), "__grp", "left_anti")
    redo = (
        sized.join(F.broadcast(short), "__grp")
        .withColumn(rank_col, F.row_number().over(win))
    )
    return (
        ok.unionByName(redo)
        .where(F.col(rank_col) <= k)
        .drop("__lane", "__grp", "__n")
    )
