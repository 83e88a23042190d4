import sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pprl_spark.spark.session import get_spark

spark = get_spark("t", master="local[32]")
spark.range(1000).selectExpr("sum(id)").collect()
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or [
    "q1_pricing_summary","q3_top_orders","q5_region_revenue","events_hourly",
    "events_top_type_per_user","token_frequencies","corpus_token_stats","dedup_exact",
    "text_quality","fingerprint_md5","embedding_topk","minhash_dedup_pairs",
    "simhash_dup_pairs","pprl_mask_documents","pprl_match_lsh","hll_distinct_users",
    "cms_event_type_counts","quantile_sketches"]
q = E.queries()
for n in names:
    t0 = time.monotonic()
    rows = len(q[n](spark, sf).collect())
    print(f"{n:30s} {time.monotonic()-t0:7.1f}s rows={rows}", flush=True)
spark.stop()
