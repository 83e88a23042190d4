import sys, time; sys.path.insert(0,"/root/repo")
from pprl_spark.spark.session import get_spark
from pprl_spark.spark.dedup import qgram_tokens, minhash_lsh_pairs
from pyspark.sql import functions as F
spark = get_spark("p", master="local[32]")
spark.range(100).count()
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t0=time.monotonic()
n_tok = docs.select(F.explode(qgram_tokens(F.col("text"),5)).alias("t")).count()
print("explode tokens:", round(time.monotonic()-t0,1), "s rows:", n_tok, flush=True)
toks = docs.select(F.col("doc_id").alias("__id"), F.explode(qgram_tokens(F.col("text"),5)).alias("__t"))
for nh in (32, 64, 128):
    t0=time.monotonic()
    sig = toks.groupBy("__id").agg(*[F.min(F.xxhash64(F.lit(j), F.col("__t"))).alias(f"h{j}") for j in range(nh)])
    sig.count()
    print(f"sig nh={nh}:", round(time.monotonic()-t0,1), "s", flush=True)
t0=time.monotonic()
pairs = minhash_lsh_pairs(docs, "doc_id", "text", q=5, num_hashes=128, bands=16)
print("pairs:", pairs.count(), round(time.monotonic()-t0,1), "s", flush=True)
spark.stop()
