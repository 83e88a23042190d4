"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PPRL flow (mask → LSH-blocked Dice match) on
sf0.001 documents.  ``queries()`` — one entry per implemented operator
family from SURVEY.md §2 (+ the training-data-pipeline ops).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query;
bit-exact PPRL stages, sketch estimates, and xxhash64-based ops carry no
oracle (driver records the weaker rows-only check).

Float policy: every float-valued output column is rounded the same way in
the Spark query and the oracle (2 dp for money sums, 4–6 dp for ratios),
so order-insensitive value hashing is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def _flagship_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → normalize-free CLK mask → LSH self-match (Dice)."""
    from pprl_spark.config import (
        CLKFilter,
        HashConfig,
        HashFunctionConfig,
        MaskConfig,
        MatchConfig,
    )
    from pprl_spark.spark.lsh import LSHConfig
    from pprl_spark.spark.mask import mask
    from pprl_spark.spark.match import match_lsh

    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"), F.col("text")
    )
    # Config notes, tuned on the testdata similarity distribution:
    # * q=4 grams — the synthetic word-salad corpus has ~146 distinct
    #   bigrams, so q=2 vectors are all near-identical; 4-grams separate
    #   true near-duplicates (dice >= 0.85) from the background (<= 0.68).
    # * m=1024, k=3 sizes the filter to ~45% fill,
    #   the Hamming-LSH operating point: sparse vectors agree on their
    #   zeros, so background bit-agreement would approach 1 and every pair
    #   would collide; at 50% fill background agreement drops to ~0.5 and
    #   0.5^band_width kills false candidates.
    cfg = MaskConfig(
        filter=CLKFilter(1024, 3),
        hash=HashConfig(HashFunctionConfig(("sha256", "md5")), "double_hash"),
        token_size=4,
        padding="_",
        prepend_attribute_name=False,
    )
    encoded = mask(docs, cfg, ["text"])
    # band_width=16 so the corpus's high background bit-agreement
    # (~0.52 at this fill) yields ~1.6e-3 collisions/pair,
    # while borderline 0.85-dice pairs (agreement ~0.87) collide w.p. 0.999;
    # max_bucket_size drops degenerate all-agree buckets (hot-key guard)
    return match_lsh(
        encoded,
        None,
        MatchConfig("dice", 0.85),
        LSHConfig(num_bits=1024, num_bands=64, band_width=16, seed=727),
        max_bucket_size=400,
    )


def entry(spark: SparkSession) -> DataFrame:
    return _flagship_matches(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# SQL-expressible queries (oracle-checked)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_top_orders(spark, sf_dir):
    cust = _load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    region = _load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _load(spark, sf_dir, "nation")
    cust = _load(spark, sf_dir, "customer")
    supp = _load(spark, sf_dir, "supplier")
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


def events_hourly(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def events_top_type_per_user(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "n")
    )


def distinct_users_exact(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("user_id").alias("distinct_users"))


def _doc_tokens(spark, sf_dir):
    from pprl_spark.spark.stats import with_tokens

    docs = _load(spark, sf_dir, "documents")
    return with_tokens(docs, "text", q=2, padding="_")


def token_frequencies(spark, sf_dir):
    return (
        _doc_tokens(spark, sf_dir)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def avg_token_count(spark, sf_dir):
    return _doc_tokens(spark, sf_dir).agg(
        F.round(F.avg(F.size("tokens")), 6).alias("avg_tokens")
    )


def ngram_entropy(spark, sf_dir):
    # H = log2(N) − (Σ f·log2 f)/N — one aggregation, same formula as the
    # oracle so the float path matches to well past 6 dp
    freq = token_frequencies(spark, sf_dir)
    return freq.agg(
        F.sum("freq").alias("__n"),
        F.sum(F.col("freq") * F.log2("freq")).alias("__flogf"),
    ).select(
        F.round(F.log2(F.col("__n")) - F.col("__flogf") / F.col("__n"), 6).alias("entropy")
    )


def dedup_exact(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count")
    ).select("doc_id", "dup_count")


def text_quality(spark, sf_dir):
    from pprl_spark.spark.textstats import (
        bpe_ish_token_count,
        punct_ratio,
        quality_score,
        whitespace_token_count,
    )

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("n_tokens_ws"),
        bpe_ish_token_count(F.col("text")).alias("n_tokens_bpe"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )


def adjacent_jaccard(spark, sf_dir):
    from pprl_spark.spark.dedup import ngram_jaccard, qgram_tokens

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", qgram_tokens(F.col("text"), 3).alias("toks"))
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = toks.select((F.col("doc_id") - 1).alias("id_a"), F.col("toks").alias("toks_b"))
    return (
        a.join(b, "id_a")
        .select("id_a", F.round(ngram_jaccard(F.col("toks_a"), F.col("toks_b")), 6).alias("jaccard"))
    )


def fingerprint_md5(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    normalized = F.concat_ws(
        " ", F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    )
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


def embedding_topk(spark, sf_dir):
    from pprl_spark.spark.ann import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(emb, queries, k=3)
    return top.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 4).alias("cosine"), "rank"
    )


# ---------------------------------------------------------------------------
# non-SQL-expressible queries (rows-only driver check)
# ---------------------------------------------------------------------------

def hll_distinct_users(spark, sf_dir):
    from pprl_spark.sketch import HyperLogLog, sketch_column

    ev = _load(spark, sf_dir, "events")
    sk = sketch_column(ev, "user_id", lambda: HyperLogLog(p=14))
    return spark.createDataFrame([(float(sk.estimate()),)], "hll_estimate double")


def hll_distinct_urls_by_lang(spark, sf_dir):
    from pprl_spark.sketch import HyperLogLog
    from pprl_spark.sketch.spark_agg import sketch_grouped

    docs = _load(spark, sf_dir, "documents")
    out = sketch_grouped(docs, ["lang"], "text", lambda: HyperLogLog(p=14),
                         estimate_name="distinct_texts")
    return out.select("lang", F.round(F.col("distinct_texts"), 1).alias("distinct_texts"))


def cms_event_type_counts(spark, sf_dir):
    from pprl_spark.sketch import CountMinSketch, sketch_column

    ev = _load(spark, sf_dir, "events")
    sk = sketch_column(ev, "event_type", lambda: CountMinSketch(width=2719, depth=5))
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    hashes = {
        r["event_type"]: r["h"]
        for r in ev.select("event_type").distinct()
        .select("event_type", F.xxhash64("event_type").alias("h")).collect()
    }
    rows = [(t, int(sk.estimate([hashes[t]])[0])) for t in sorted(types)]
    return spark.createDataFrame(rows, "event_type string, est_count long")


def kll_value_quantiles(spark, sf_dir):
    from pprl_spark.sketch import KLLSketch, sketch_column

    ev = _load(spark, sf_dir, "events")
    sk = sketch_column(ev, "value", lambda: KLLSketch(k=200))
    rows = [(q, float(sk.quantile(q))) for q in (0.1, 0.5, 0.9)]
    return spark.createDataFrame(rows, "q double, value double")


def tdigest_value_quantiles(spark, sf_dir):
    from pprl_spark.sketch import TDigest, sketch_column

    ev = _load(spark, sf_dir, "events")
    sk = sketch_column(ev, "value", lambda: TDigest(compression=100))
    rows = [(q, float(sk.quantile(q))) for q in (0.01, 0.5, 0.99)]
    return spark.createDataFrame(rows, "q double, value double")


def bloom_customer_membership(spark, sf_dir):
    from pprl_spark.sketch import BloomFilter, sketch_column

    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    bf = sketch_column(cust, "c_custkey", lambda: BloomFilter.for_capacity(200_000, 0.01))
    hashes = orders.select(F.xxhash64("o_custkey").alias("h"))
    import numpy as np

    hits = int(bf.contains(np.array([r["h"] for r in hashes.collect()], dtype=np.int64)).sum())
    total = orders.count()
    return spark.createDataFrame([(hits, total)], "member_hits long, total long")


def pprl_mask_documents(spark, sf_dir):
    from pprl_spark.config import CLKFilter, HashConfig, HashFunctionConfig, MaskConfig
    from pprl_spark.spark.mask import mask_b64

    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text"
    )
    cfg = MaskConfig(
        filter=CLKFilter(1024, 5),
        hash=HashConfig(HashFunctionConfig(("sha256", "md5")), "double_hash"),
        token_size=2,
        padding="_",
        prepend_attribute_name=False,
    )
    return mask_b64(docs, cfg, ["text"])


def pprl_match_lsh(spark, sf_dir):
    out = _flagship_matches(spark, sf_dir)
    return out.select(
        "domain_id", "range_id", F.round(F.col("similarity"), 6).alias("similarity")
    )


def minhash_dedup_pairs(spark, sf_dir):
    from pprl_spark.spark.dedup import jaccard_verify, minhash_lsh_pairs

    docs = _load(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs(docs, "doc_id", "text", q=5, num_hashes=128, bands=16)
    return jaccard_verify(cands, docs, "doc_id", "text", q=5, threshold=0.8).select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


def simhash_dup_pairs(spark, sf_dir):
    from pprl_spark.spark.dedup import simhash_pairs

    docs = _load(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs, "doc_id", "text", q=3, chunks=4)
    return pairs.filter(F.col("hamming") <= 6)


def langid_documents(spark, sf_dir):
    from pprl_spark.spark.textstats import lang_id_udf

    docs = _load(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_udf()(F.col("text")).alias("lang_pred"))


def ann_lsh_topk(spark, sf_dir):
    from pprl_spark.spark.ann import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = lsh_topk(emb, queries, k=3, num_planes=10, probes=4)
    return top.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 4).alias("cosine"), "rank"
    )


def multimodal_decode(spark, sf_dir):
    from pprl_spark.spark.multimodal import decode_image_features

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = decode_image_features(docs, embedding_dim=8)
    return feats.select("doc_id", "width", "height", "n_channels", "sha256")




def transform_datetime(spark, sf_dir):
    """date_time transformer (reference transform.py:58-62) over orders."""
    from pprl_spark.config import AttributeTransformerConfig, TransformConfig, TransformerSpec
    from pprl_spark.spark.transform import transform

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("string").alias("odate")
    )
    cfg = TransformConfig(
        attribute_transformers=(
            AttributeTransformerConfig(
                "odate",
                (TransformerSpec("date_time", input_format="%Y-%m-%d %H:%M:%S",
                                 output_format="%d.%m.%Y"),),
            ),
        ),
    )
    return transform(orders, cfg, ["odate"])


def transform_number(spark, sf_dir):
    """number transformer (transform.py:49-55): reformat discounts to 2dp."""
    from pprl_spark.config import AttributeTransformerConfig, TransformConfig, TransformerSpec
    from pprl_spark.spark.transform import transform

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_discount").cast("string").alias("disc")
    )
    cfg = TransformConfig(
        attribute_transformers=(
            AttributeTransformerConfig("disc", (TransformerSpec("number", decimal_places=2),)),
        ),
    )
    return transform(li, cfg, ["disc"])


def transform_mapping(spark, sf_dir):
    """mapping transformer with default (transform.py:83-94)."""
    from pprl_spark.config import AttributeTransformerConfig, TransformConfig, TransformerSpec
    from pprl_spark.spark.transform import transform

    cust = _load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    cfg = TransformConfig(
        attribute_transformers=(
            AttributeTransformerConfig(
                "seg",
                (TransformerSpec("mapping",
                                 mapping={"BUILDING": "B", "MACHINERY": "M", "AUTOMOBILE": "A"},
                                 default_value="X"),),
            ),
        ),
    )
    return transform(cust, cfg, ["seg"])


def pprl_mask_hardened(spark, sf_dir):
    """CLK + full hardener chain (balance/permute/rule_90/xor_fold)."""
    from pprl_spark.config import (CLKFilter, HardenerConfig, HashConfig,
                                   HashFunctionConfig, MaskConfig)
    from pprl_spark.spark.mask import mask_b64

    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text"
    )
    cfg = MaskConfig(
        filter=CLKFilter(512, 5),
        hash=HashConfig(HashFunctionConfig(("sha1",)), "double_hash"),
        token_size=2,
        padding="_",
        prepend_attribute_name=False,
        hardeners=(
            HardenerConfig("balance"),
            HardenerConfig("permute", seed=727),
            HardenerConfig("rule_90"),
            HardenerConfig("xor_fold"),
        ),
    )
    return mask_b64(docs, cfg, ["text"])


def pprl_mask_rbf(spark, sf_dir):
    """RBF encoder over two weighted attributes (routers/mask.py:292-382)."""
    from pprl_spark.config import (HashConfig, HashFunctionConfig, MaskConfig,
                                   RBFFilter, WeightedAttributeConfig)
    from pprl_spark.spark.mask import mask_b64

    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text", "lang"
    )
    cfg = MaskConfig(
        filter=RBFFilter(hash_values=4, seed=727),
        hash=HashConfig(HashFunctionConfig(("sha1",)), "double_hash"),
        token_size=2,
        padding="_",
        attributes=(
            WeightedAttributeConfig("text", weight=4, average_token_count=40),
            WeightedAttributeConfig("lang", weight=1, average_token_count=3),
        ),
    )
    return mask_b64(docs, cfg, ["text", "lang"])


def pprl_mask_clkrbf(spark, sf_dir):
    """CLKRBF encoder: weight-scaled k per attribute (routers/mask.py:238-289)."""
    from pprl_spark.config import (CLKRBFFilter, HashConfig, HashFunctionConfig,
                                   MaskConfig, WeightedAttributeConfig)
    from pprl_spark.spark.mask import mask_b64

    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text", "lang"
    )
    cfg = MaskConfig(
        filter=CLKRBFFilter(hash_values=3),
        hash=HashConfig(HashFunctionConfig(("sha1",)), "double_hash"),
        token_size=2,
        padding="_",
        attributes=(
            WeightedAttributeConfig("text", weight=4, average_token_count=40),
            WeightedAttributeConfig("lang", weight=1, average_token_count=3),
        ),
    )
    return mask_b64(docs, cfg, ["text", "lang"])


def pprl_match_crosswise_sample(spark, sf_dir):
    """Exhaustive crosswise matcher (routers/match.py:54-67) on a 100-doc
    sample - the oracle semantics the LSH matcher reproduces."""
    from pprl_spark.config import (CLKFilter, HashConfig, HashFunctionConfig,
                                   MaskConfig, MatchConfig)
    from pprl_spark.spark.mask import mask
    from pprl_spark.spark.match import match_crosswise

    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        F.col("doc_id").cast("string").alias("id"), "text"
    )
    cfg = MaskConfig(
        filter=CLKFilter(1024, 3),
        hash=HashConfig(HashFunctionConfig(("sha256", "md5")), "double_hash"),
        token_size=4,
        padding="_",
        prepend_attribute_name=False,
    )
    enc = mask(docs, cfg, ["text"])
    out = match_crosswise(enc, enc, MatchConfig("jaccard", 0.55), broadcast_range=True)
    return out.filter(F.col("domain_id") < F.col("range_id")).select(
        "domain_id", "range_id", F.round(F.col("similarity"), 6).alias("similarity")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / aggregation / join / window coverage
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_orders": q3_top_orders,
        "q5_region_revenue": q5_region_revenue,
        "events_hourly": events_hourly,
        "events_top_type_per_user": events_top_type_per_user,
        "distinct_users_exact": distinct_users_exact,
        # tokenization / stats (reference §2.3, §2.7)
        "token_frequencies": token_frequencies,
        "avg_token_count": avg_token_count,
        "ngram_entropy": ngram_entropy,
        # training-data pipeline ops
        "dedup_exact": dedup_exact,
        "text_quality": text_quality,
        "adjacent_jaccard": adjacent_jaccard,
        "fingerprint_md5": fingerprint_md5,
        "embedding_topk": embedding_topk,
        # transform chains (reference 2.2)
        "transform_datetime": transform_datetime,
        "transform_number": transform_number,
        "transform_mapping": transform_mapping,
        # sketches (rows-only)
        "hll_distinct_users": hll_distinct_users,
        "hll_distinct_texts_by_lang": hll_distinct_urls_by_lang,
        "cms_event_type_counts": cms_event_type_counts,
        "kll_value_quantiles": kll_value_quantiles,
        "tdigest_value_quantiles": tdigest_value_quantiles,
        "bloom_customer_membership": bloom_customer_membership,
        # PPRL stages (bit-exact; rows-only)
        "pprl_mask_documents": pprl_mask_documents,
        "pprl_mask_hardened": pprl_mask_hardened,
        "pprl_mask_rbf": pprl_mask_rbf,
        "pprl_mask_clkrbf": pprl_mask_clkrbf,
        "pprl_match_lsh": pprl_match_lsh,
        "pprl_match_crosswise_sample": pprl_match_crosswise_sample,
        # near-dup / ANN / text (rows-only where xxhash64/UDF-based)
        "minhash_dedup_pairs": minhash_dedup_pairs,
        "simhash_dup_pairs": simhash_dup_pairs,
        "langid_documents": langid_documents,
        "ann_lsh_topk": ann_lsh_topk,
        "multimodal_decode": multimodal_decode,
    }


_GRAMS_CTE = """
WITH grams AS (
  SELECT doc_id,
         unnest(list_distinct([substring('_' || text || '_', CAST(i AS INT), 2)
                               FOR i IN range(1, length(text) + 2)])) AS token
  FROM documents
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "transform_datetime": """
            SELECT o_orderkey, strftime(o_orderdate, '%d.%m.%Y') AS odate
            FROM orders
        """,
        "transform_number": """
            SELECT l_orderkey, l_linenumber, printf('%.2f', l_discount) AS disc
            FROM lineitem
        """,
        "transform_mapping": """
            SELECT c_custkey,
                   CASE c_mktsegment WHEN 'BUILDING' THEN 'B'
                                     WHEN 'MACHINERY' THEN 'M'
                                     WHEN 'AUTOMOBILE' THEN 'A'
                                     ELSE 'X' END AS seg
            FROM customer
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "events_top_type_per_user": """
            WITH counts AS (
              SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY 1, 2
            ), ranked AS (
              SELECT user_id, event_type, n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type) AS rn
              FROM counts
            )
            SELECT user_id, event_type, n FROM ranked WHERE rn = 1
        """,
        "distinct_users_exact": """
            SELECT count(DISTINCT user_id) AS distinct_users FROM events
        """,
        "token_frequencies": _GRAMS_CTE + """
            SELECT token, count(*) AS freq FROM grams GROUP BY token
        """,
        "avg_token_count": _GRAMS_CTE + """
            , per_doc AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id)
            SELECT round(avg(n), 6) AS avg_tokens FROM per_doc
        """,
        "ngram_entropy": _GRAMS_CTE + """
            , freq AS (SELECT token, count(*)::DOUBLE AS f FROM grams GROUP BY token)
            SELECT round(log2(sum(f)) - sum(f * log2(f)) / sum(f), 6) AS entropy FROM freq
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "text_quality": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens_ws,
                   length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens_bpe,
                   round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
                         / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
                   round(((CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
                                     / greatest(length(text), 1)::DOUBLE <= 0.2 THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN length(text)::DOUBLE / greatest(
                                  CASE WHEN trim(text) = '' THEN 0
                                       ELSE length(regexp_split_to_array(trim(text), '\s+')) END, 1)
                                BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
            FROM documents
        """,
        "adjacent_jaccard": """
            WITH toks AS (
              SELECT doc_id,
                     list_distinct([substring(text, CAST(i AS INT), 3)
                                    FOR i IN range(1, greatest(length(text) - 2, 1) + 1)]) AS t
              FROM documents
            )
            SELECT a.doc_id AS id_a,
                   round(length(list_intersect(a.t, b.t))::DOUBLE
                         / length(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
            FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
        """,
        "fingerprint_md5": r"""
            SELECT doc_id,
                   md5(array_to_string(list_filter(regexp_split_to_array(text, '\s+'),
                                                   w -> w <> ''), ' ')) AS fingerprint
            FROM documents
        """,
        "embedding_topk": """
            WITH scored AS (
              SELECT q.vec_id AS query_id, i.vec_id AS vec_id,
                     round(list_cosine_similarity(i.embedding, q.embedding), 4) AS cosine,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(i.embedding, q.embedding) DESC,
                                i.vec_id
                     ) AS rank
              FROM embeddings i, embeddings q
              WHERE q.vec_id < 5
            )
            SELECT query_id, vec_id, cosine, rank FROM scored WHERE rank <= 3
        """,
    }
