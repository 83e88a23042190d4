"""Approximate nearest-neighbor search over embedding columns.

Two paths:

* **brute-force** — exact cosine top-k: broadcast the (small) query set,
  score every (item, query) pair with JVM array expressions
  (``zip_with``/``aggregate`` dot products — codegen, no Python), window
  top-k.  The baseline/oracle, O(N·Q).
* **LSH-bucketed** — random-hyperplane sign buckets with multi-probe
  (flip one plane at a time): candidate generation becomes an equi-join
  on bucket keys; exact cosine re-scores candidates.  The 100 TB path —
  per-query work scales with bucket occupancy, not N.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = ["cosine_expr", "brute_force_topk", "hyperplane_buckets_udf", "lsh_topk"]


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    sq = lambda c: F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)  # noqa: E731
    return (dot / F.sqrt(sq(a) * sq(b))).cast("double")


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query.  The query side is broadcast — at
    web scale N is huge but Q (the probe set) is small."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv"))
    )
    scored = items.select(F.col(item_id).alias("__iid"), F.col(vec_col).alias("__iv")).crossJoin(q)
    scored = scored.withColumn("cosine", cosine_expr(F.col("__iv"), F.col("__qv")))
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__iid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__iid").alias(item_id),
            "cosine",
            "rank",
        )
    )


def hyperplane_buckets_udf(dim: int, num_planes: int = 12, seed: int = 727, probes: int = 0):
    """pandas UDF: embedding → array<long> of bucket keys (primary sign
    bucket + ``probes`` single-plane-flip neighbors for multi-probe)."""
    planes = np.random.default_rng(seed).standard_normal((dim, num_planes))
    weights = (np.int64(1) << np.arange(num_planes, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="object")
        mat = np.stack(vecs.to_numpy())
        proj = mat @ planes
        primary = (proj > 0).astype(np.int64) @ weights
        if probes <= 0:
            return pd.Series([[int(p)] for p in primary])
        # multi-probe: flip the `probes` planes with smallest |projection|
        order = np.argsort(np.abs(proj), axis=1)[:, :probes]
        out = []
        for row in range(mat.shape[0]):
            keys = [int(primary[row])]
            for plane in order[row]:
                keys.append(int(primary[row] ^ np.int64(1) << np.int64(plane)))
            out.append(keys)
        return pd.Series(out)

    return _buckets


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    probes: int = 3,
    seed: int = 727,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: items keyed by primary bucket,
    queries probe primary + flipped buckets, exact cosine re-score."""
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    item_buckets = hyperplane_buckets_udf(dim, num_planes, seed, probes=0)
    query_buckets = hyperplane_buckets_udf(dim, num_planes, seed, probes=probes)

    it = items.select(
        F.col(item_id).alias("__iid"),
        F.col(vec_col).alias("__iv"),
        F.explode(item_buckets(F.col(vec_col))).alias("bucket"),
    )
    qs = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        F.explode(query_buckets(F.col(vec_col))).alias("bucket"),
    )
    cands = (
        it.join(F.broadcast(qs), "bucket")
        .dropDuplicates(["__iid", "__qid"])
        .withColumn("cosine", cosine_expr(F.col("__iv"), F.col("__qv")))
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__iid"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__iid").alias(item_id),
            "cosine",
            "rank",
        )
    )
