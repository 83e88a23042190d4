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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_expr",
    "brute_force_topk",
    "rademacher_planes",
    "srp_projections",
    "lsh_topk",
    "ivf_topk",
]


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


def rademacher_planes(num_planes: int, dim: int, seed: int = 727) -> list:
    """±1 hyperplane components from a seeded PRNG — sign-random-projection
    LSH works with Rademacher vectors exactly like Gaussian ones
    (Achlioptas-style sparse/signed projections), and integer signs make
    the bucket computation a pure Catalyst expression that a SQL oracle
    reproduces bit-for-bit (float32 negation is exact; the fold order is
    sequential in both engines)."""
    import random

    rng = random.Random(seed)
    return [
        [1 if rng.random() < 0.5 else -1 for _ in range(dim)]
        for _ in range(num_planes)
    ]


def srp_projections(vec: Column, planes: list) -> list:
    """One signed-sum projection Column per plane: sequential fold of
    ±v_d (float32-exact negation) into a double accumulator — the same
    arithmetic a SQL ``list_sum`` over CASE'd casts performs."""
    out = []
    for plane in planes:
        signs = F.array(*[F.lit(s) for s in plane])
        signed = F.zip_with(vec, signs, lambda x, s: F.when(s > 0, x).otherwise(-x))
        out.append(F.aggregate(signed, F.lit(0.0), lambda a, x: a + x))
    return out


def _srp_bucket_cols(vec: Column, planes: list, probes: int):
    """(primary bucket, probe-bucket array) as Catalyst expressions.
    Multi-probe flips the ``probes`` planes with smallest |projection|
    (ties broken by plane index — array_sort on (|proj|, plane) structs)."""
    num_planes = len(planes)
    projs = srp_projections(vec, planes)
    primary = None
    for p, proj in enumerate(projs):
        bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        primary = bit if primary is None else primary + bit
    if probes <= 0:
        return primary, F.array(primary)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(proj).alias("a"), F.lit(p).alias("p"))
                for p, proj in enumerate(projs)
            ]
        )
    )
    powers = F.array(*[F.lit(1 << p).cast("long") for p in range(num_planes)])
    buckets = [primary]
    for i in range(probes):
        flip = F.element_at(powers, F.element_at(ranked, i + 1)["p"] + 1)
        buckets.append(primary.bitwiseXOR(flip))
    return primary, F.array(*buckets)


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
    queries probe primary + flipped buckets, exact cosine re-score.
    Buckets are sign-random-projection keys over Rademacher planes —
    pure Catalyst expressions, no Python worker (and SQL-oracle-exact)."""
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    planes = rademacher_planes(num_planes, dim, seed)
    item_primary, _ = _srp_bucket_cols(F.col(vec_col), planes, probes=0)
    _, query_buckets = _srp_bucket_cols(F.col(vec_col), planes, probes=probes)

    it = items.select(
        F.col(item_id).alias("__iid"),
        F.col(vec_col).alias("__iv"),
        item_primary.alias("bucket"),
    )
    qs = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        F.explode(query_buckets).alias("bucket"),
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


def _dot_expr(a: Column, b: Column) -> Column:
    """float32 products folded sequentially into a double accumulator —
    the SQL-mirrorable arithmetic shared by every embedding op here."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    centroid_stride: int = 31,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer partitions vectors into cells,
    queries probe their ``n_probe`` nearest cells, exact cosine re-scores
    within the probed cells.

    Centroids are deterministic data rows (ids 0, stride, 2·stride, …) —
    data-dependent like a trained quantizer but reproducible, so the cell
    assignment is SQL-oracle-checkable.  At production scale a k-means
    centroid table drops into the same broadcast shape unchanged.

    Scale story: assignment is a broadcast cross join against C centroids
    (N·C inner products map-side, no shuffle of vectors) followed by ONE
    hash aggregation (``max_by`` — no window sort over the fact table);
    per-query candidate work is proportional to probed-cell occupancy
    (~n_probe·N/C), not N.
    """
    cents_df = items.where(
        (F.col(item_id) % centroid_stride == 0)
        & (F.col(item_id) < n_centroids * centroid_stride)
    ).select(F.col(item_id).alias("__cid"), F.col(vec_col).alias("__cv"))
    if cents_df.isEmpty():
        # an id space that misses every stride multiple would otherwise
        # produce a silently empty result
        raise ValueError(
            f"no centroid rows: no {item_id} in "
            f"[0, {n_centroids * centroid_stride}) divisible by {centroid_stride}"
        )
    cents = F.broadcast(cents_df)
    item_d = (
        items.select(F.col(item_id).alias("__iid"), F.col(vec_col).alias("__iv"))
        .crossJoin(cents)
        .select(
            "__iid", "__iv", "__cid",
            _dot_expr(F.col("__iv"), F.col("__cv")).alias("__d"),
        )
    )
    # argmax cell per item via max_by over (dot, -cid): one map-side-
    # combined hash agg, ties to the smaller centroid id
    assigned = item_d.groupBy("__iid").agg(
        F.max_by(
            "__cid", F.struct(F.col("__d").alias("d"), (-F.col("__cid")).alias("nc"))
        ).alias("__cid"),
        F.any_value("__iv").alias("__iv"),
    )
    q_d = (
        queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv"))
        .crossJoin(cents)
        .select(
            "__qid", "__qv", "__cid",
            _dot_expr(F.col("__qv"), F.col("__cv")).alias("__d"),
        )
    )
    wq = Window.partitionBy("__qid").orderBy(F.desc("__d"), F.asc("__cid"))
    q_cells = (
        q_d.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= n_probe)
        .select("__qid", "__qv", "__cid")
    )
    scored = q_cells.join(assigned, "__cid").withColumn(
        "cosine", cosine_expr(F.col("__iv"), F.col("__qv"))
    )
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
