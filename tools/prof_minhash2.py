import sys, time; sys.path.insert(0,"/root/repo")
from pprl_spark.spark.session import get_spark
import __spark_entry__ as E
spark = get_spark("p", master="local[32]")
spark.range(100).count()
t0=time.monotonic()
n = len(E.queries()["minhash_dedup_pairs"](spark, "/root/testdata/sf0.1").collect())
print("full minhash_dedup_pairs:", round(time.monotonic()-t0,1), "s rows:", n, flush=True)
from pprl_spark.spark.dedup import minhash_lsh_pairs, jaccard_verify
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t0=time.monotonic()
cands = minhash_lsh_pairs(docs, "doc_id", "text", q=5, num_hashes=128, bands=16)
v = jaccard_verify(cands.cache(), docs, "doc_id", "text", q=5, threshold=0.8)
print("verify-with-cached-cands:", len(v.collect()), round(time.monotonic()-t0,1), "s", flush=True)
spark.stop()
