"""Deduplication operators for web-scale training-data pipelines.

Five families, each chosen to stay JVM-side (whole-stage codegen) wherever
the semantics allow:

* **exact** — hash-groupBy on the content (one shuffle, map-side combine).
* **MinHash + LSH** — q-gram shingles → per-seed min of ``xxhash64(seed,
  token)`` → band hashes → explode + self-equi-join.  Everything up to the
  join is pure Catalyst expressions (no Python in the hot path).
* **n-gram Jaccard** — exact verify step for candidate pairs (JVM set ops
  ``array_intersect`` / ``array_union``).
* **SimHash** — 64-bit sign-aggregated fingerprint (vectorized pandas UDF:
  per-batch numpy bit unpacking), banded into 4×16-bit chunks for
  Hamming-≤-k candidate joins.
* **embedding cosine** — near-duplicate pairs over an embedding column via
  random-hyperplane LSH buckets + exact cosine verify (see also ann.py).

All shuffles key on content-derived hashes → uniformly distributed by
construction; duplicate-cluster skew (one document repeated 10^6×) is the
residual hazard, handled by AQE skew-join plus the ``max_bucket_size``
escape hatch on the join stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = [
    "qgram_tokens",
    "word_tokens",
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "jaccard_verify",
    "simhash_udf",
    "simhash_pairs",
    "embedding_cosine_pairs",
]


# ---------------------------------------------------------------- tokens

def qgram_tokens(col: Column | str, q: int = 5) -> Column:
    """Distinct character q-grams, pure Catalyst (sequence+substring).
    (The PPRL-parity padded tokenizer lives in kernels.tokenize; this one
    is the unpadded shingle used by dedup, matching common practice.)"""
    col = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (q - 1), F.lit(1))),
            lambda i: F.substring(col, i, q),
        )
    )


def word_tokens(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact content value.
    Shuffle keys on a 64-bit content hash, not the full text, so wide rows
    don't inflate the exchange; the full content never leaves the map side."""
    h = F.xxhash64(F.col(content_col))
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__h")
    )


# ---------------------------------------------------------------- minhash

def minhash_signature(tokens: Column, num_hashes: int = 64) -> Column:
    """array<long> MinHash signature: per seed j, min over tokens of
    xxhash64(j, token).  Pure Catalyst — fine for modest num_hashes when
    the result is consumed *once*; the LSH pipeline below instead uses the
    explode + multi-min aggregate form, because Catalyst inlines
    deterministic expressions and would otherwise re-evaluate the whole
    signature (and the tokenizer under it) once per band hash."""
    return F.array(
        *[
            F.array_min(F.transform(tokens, lambda t, j=j: F.xxhash64(F.lit(j), t)))
            for j in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    q: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    rows-per-band r = num_hashes/bands; collision prob of a pair with
    Jaccard s is 1-(1-s^r)^b.  Output: (id_a, id_b) with id_a < id_b,
    deduplicated.  Feed to :func:`jaccard_verify` for the exact check.

    Plan shape: tokenize once → explode → ``num_hashes`` map-side-combined
    ``min`` aggregations keyed on the (uniform) doc id — one shuffle whose
    rows are (id, 64×8B), independent of document length — then band
    hashes and the (band, bucket) self-join.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(qgram_tokens(F.col(text_col), q)).alias("__t"),
    )
    sig = toks.groupBy("__id").agg(
        *[F.min(F.xxhash64(F.lit(j), F.col("__t"))).alias(f"h{j}") for j in range(num_hashes)]
    )
    banded = sig.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col(f"h{band * r + k}") for k in range(r)])
                    for band in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
        banded = banded.join(
            sizes.filter(F.col("__n") <= max_bucket_size).drop("__n"),
            on=["band", "bucket"],
            how="inner",
        )
    left = banded.withColumnRenamed("__id", "id_a")
    right = banded.withColumnRenamed("__id", "id_b")
    return (
        left.join(right, on=["band", "bucket"], how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------- jaccard

def ngram_jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    """Exact Jaccard of two token arrays — JVM set ops."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b))
    union = F.size(F.array_union(tokens_a, tokens_b))
    return (inter / union).cast("double")


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    q: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their token sets and keep
    those with exact q-gram Jaccard ≥ threshold."""
    toks = df.select(
        F.col(id_col).alias("__jid"), qgram_tokens(F.col(text_col), q).alias("__jtok")
    )
    return (
        pairs.join(toks.withColumnRenamed("__jid", "id_a").withColumnRenamed("__jtok", "__tok_a"), "id_a")
        .join(toks.withColumnRenamed("__jid", "id_b").withColumnRenamed("__jtok", "__tok_b"), "id_b")
        .withColumn("jaccard", ngram_jaccard(F.col("__tok_a"), F.col("__tok_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- simhash

def simhash_udf(q: int = 3):
    """pandas UDF: text → 64-bit SimHash.

    Per Arrow batch: q-gram shingles hashed with blake2b-derived 64-bit
    values; each hash votes +1/−1 on its 64 bit positions; the sign of the
    per-position sum is the fingerprint bit.  numpy-vectorized per row
    over the token axis."""
    import hashlib

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for row, text in enumerate(texts):
            if not text:
                continue
            grams = {text[i : i + q] for i in range(max(len(text) - q + 1, 1))}
            hashes = np.array(
                [
                    int.from_bytes(
                        hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
                    )
                    for g in grams
                ],
                dtype=np.uint64,
            )
            bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            votes = bits.astype(np.int32).sum(axis=0) * 2 - len(hashes)
            fingerprint = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
            out[row] = int.from_bytes(fingerprint.tobytes(), "little", signed=True)
        return pd.Series(out)

    return _simhash


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    q: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Candidate pairs whose SimHash agrees on ≥1 of ``chunks`` equal-width
    chunks (pigeonhole: Hamming distance < chunks ⇒ some chunk equal)."""
    width = 64 // chunks
    sh = df.select(
        F.col(id_col).alias("__id"), simhash_udf(q)(F.col(text_col)).alias("__sh")
    )
    chunk_cols = F.array(
        *[
            F.shiftrightunsigned(F.col("__sh"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(chunks)
        ]
    )
    banded = sh.select("__id", "__sh", F.posexplode(chunk_cols).alias("chunk", "key"))
    left = banded.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), "chunk", "key"
    )
    right = banded.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), "chunk", "key"
    )
    pairs = (
        left.join(right, on=["chunk", "key"], how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact Hamming distance via bit_count(xor)
    return pairs.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    )


# ---------------------------------------------------------------- embeddings

def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 727,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs over an ``array<float>`` embedding column.

    Random-hyperplane LSH: sign pattern of ``num_planes`` projections is
    the bucket key (collision prob 1−θ/π per plane); exact cosine verifies
    within buckets.  Projections are a vectorized pandas UDF (one matmul
    per Arrow batch)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).standard_normal((dim, num_planes))

    @F.pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="int64")
        mat = np.stack(vecs.to_numpy())
        signs = (mat @ planes) > 0
        weights = (np.int64(1) << np.arange(num_planes, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    bucketed = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), _bucket(F.col(vec_col)).alias("bucket")
    )
    left = bucketed.select(F.col("__id").alias("id_a"), F.col("__v").alias("v_a"), "bucket")
    right = bucketed.select(F.col("__id").alias("id_b"), F.col("__v").alias("v_b"), "bucket")
    pairs = (
        left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))  # noqa: E731
    return (
        pairs.withColumn("cosine", (dot / (norm(F.col("v_a")) * norm(F.col("v_b")))).cast("double"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
