"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

Scaling mode (north_rule evidence, no real cluster in this sandbox):
  python bench.py --scaling
runs the flagship encode+sketch job at local[8] and local[32] on the SAME
synthetic input in separate subprocesses (cold JVM each) and reports
throughput at both plus scaling efficiency = (t_8 / t_32) / 4.

  python bench.py --scaling-worker local[N] <n_pages>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(master: str):
    from pprl_spark.spark.session import get_spark

    return get_spark("pprl-bench", master=master)


def _timed(fn) -> float:
    start = time.monotonic()
    fn()
    return round(time.monotonic() - start, 3)


# ---------------------------------------------------------------------------
# headline queries
# ---------------------------------------------------------------------------

def run_headline() -> dict:
    import __spark_entry__ as E

    spark = _session(f"local[{CPUS}]")
    # warm the Python UDF workers + JVM before timing
    spark.range(1000).selectExpr("sum(id)").collect()

    q = E.queries()
    headline = [
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_region_revenue",
        "events_hourly",
        "events_top_type_per_user",
        "token_frequencies",
        "ngram_entropy",
        "dedup_exact",
        "text_quality",
        "fingerprint_md5",
        "embedding_topk",
        "minhash_dedup_pairs",
        "simhash_dup_pairs",
        "pprl_mask_documents",
        "pprl_match_lsh",
        "hll_distinct_users",
        "cms_event_type_counts",
        "kll_value_quantiles",
        "tdigest_value_quantiles",
    ]
    timings: dict[str, float] = {}
    for name in headline:
        fn = q[name]
        timings[name] = _timed(lambda: fn(spark, SF_DIR).collect())

    # north-star throughput anchor: pages encoded + sketched per second
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    encode_s = timings["pprl_mask_documents"]
    sketch_s = timings["hll_distinct_users"]
    pages_per_sec = round(n_docs / max(encode_s + sketch_s, 1e-9), 1)

    total = round(sum(timings.values()), 3)
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1] or SF_DIR
    result = {
        "metric": "headline query wall time (sf parquet, local mode)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_label,
        "cpus": CPUS,
        "pages_per_sec_encode_sketch": pages_per_sec,
    }
    spark.stop()
    return result


# ---------------------------------------------------------------------------
# scaling evidence: same job, local[8] vs local[32]
# ---------------------------------------------------------------------------

def scaling_job(master: str, n_pages: int) -> dict:
    """Flagship job: synthesize pages → CLK-encode text → HLL(urls) +
    CMS(lang) sketches + LSH band signatures.  Compute-bound by design."""
    from pyspark.sql import functions as F

    from pprl_spark.config import CLKFilter, HashConfig, HashFunctionConfig, MaskConfig
    from pprl_spark.fixtures import make_pages
    from pprl_spark.sketch import CountMinSketch, HyperLogLog, sketch_column
    from pprl_spark.spark.lsh import LSHConfig, add_band_signatures
    from pprl_spark.spark.mask import mask

    cores = int(master.split("[")[1].rstrip("]"))
    spark = _session(master)
    spark.range(1000).selectExpr("sum(id)").collect()
    pages = make_pages(spark, n_pages, partitions=cores * 4)
    pages.write.mode("overwrite").parquet("/tmp/pprl_bench_pages.parquet")
    pages = spark.read.parquet("/tmp/pprl_bench_pages.parquet")

    cfg = MaskConfig(
        filter=CLKFilter(1024, 5),
        hash=HashConfig(HashFunctionConfig(("sha256", "md5")), "double_hash"),
        token_size=2,
        padding="_",
        prepend_attribute_name=False,
    )
    start = time.monotonic()
    encoded = mask(pages.withColumnRenamed("url", "id"), cfg, ["text"])
    banded = add_band_signatures(encoded, LSHConfig(1024, 16, 12, seed=727))
    n_buckets = banded.groupBy("band", "sig").count().count()
    hll = sketch_column(pages, "url", lambda: HyperLogLog(p=14))
    cms = sketch_column(pages, "lang", lambda: CountMinSketch(2719, 5))
    wall = time.monotonic() - start
    out = {
        "master": master,
        "n_pages": n_pages,
        "wall_sec": round(wall, 3),
        "pages_per_sec": round(n_pages / wall, 1),
        "distinct_urls_est": round(hll.estimate(), 1),
        "cms_total": cms.estimate(),
        "lsh_buckets": n_buckets,
    }
    spark.stop()
    return out


def run_scaling(n_pages: int = 120_000) -> dict:
    results = {}
    for master in ("local[8]", "local[32]"):
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-worker", master, str(n_pages)],
            capture_output=True,
            text=True,
            check=True,
        )
        results[master] = json.loads(proc.stdout.strip().splitlines()[-1])
    t8 = results["local[8]"]["wall_sec"]
    t32 = results["local[32]"]["wall_sec"]
    efficiency = round((t8 / t32) / 4.0, 3)
    # estimates must be identical across parallelism levels (merge invariance)
    est_equal = (
        results["local[8]"]["distinct_urls_est"] == results["local[32]"]["distinct_urls_est"]
        and results["local[8]"]["cms_total"] == results["local[32]"]["cms_total"]
    )
    return {
        "metric": "scaling efficiency local[8] -> local[32] (N -> 4N cores)",
        "n_pages": n_pages,
        "local8": results["local[8]"],
        "local32": results["local[32]"],
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": efficiency,
        "passes_north_rule_0_8": efficiency >= 0.8,
        "estimates_identical_across_parallelism": est_equal,
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        print(json.dumps(scaling_job(sys.argv[2], int(sys.argv[3]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
        out = run_scaling(n)
        with open("BENCH_SCALING.json", "w") as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out))
    else:
        print(json.dumps(run_headline()))
