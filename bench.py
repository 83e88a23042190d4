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

import pandas as pd

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
    # the r1-r4 headline list (kept as a named sublist so round-over-round
    # totals stay comparable after the r5 additions)
    headline_core = [
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_region_revenue",
        "events_hourly",
        "events_top_type_per_user",
        "token_frequencies",
        "corpus_token_stats",
        "dedup_exact",
        "text_quality",
        "fingerprint_jaccard",  # r5: absorbed fingerprint_md5 (+ adjacent jaccard join)
        "embedding_topk",
        "minhash_dedup_pairs",
        "simhash_dup_pairs",
        "pprl_mask_documents",
        "pprl_match_lsh",
        "hll_distinct_users",
        "cms_event_type_counts",
        "quantile_sketches",
    ]
    # r4 curation operators, tracked from r5 on (VERDICT r4 #4)
    headline = headline_core + [
        "quality_filter",
        "contamination_report",
        "documents_split",
        "lm_perplexity",  # r5 addition
    ]
    # STEAL-AWARE best-of-k (VERDICT r4 #1): this VM has ~30% run-to-run
    # hypervisor-steal noise, and entire driver windows have run at <20%
    # of quiet CPU.  Protocol: run whole-list passes, each followed by a
    # short same-window pure-CPU control; a pass whose control reads below
    # STEAL_FRACTION of the quiet reference is marked stolen and does not
    # count toward the required clean-pass quota (its per-query times
    # still participate in the min — they can only help).  Keep going
    # until MIN_CLEAN_PASSES clean passes were observed, bounded by
    # MAX_PASSES total so a permanently-stolen window still terminates
    # (the emitted clean_passes count then self-documents the discount).
    QUIET_REF = 0.77  # Mh/s/core, 32-proc sha256 control, quiet window
    STEAL_FRACTION = 0.5
    MIN_CLEAN_PASSES = 3
    MAX_PASSES = 6
    timings: dict[str, float] = {}
    passes: list[dict] = []
    clean_passes = 0
    while clean_passes < MIN_CLEAN_PASSES and len(passes) < MAX_PASSES:
        load_before = [round(x, 2) for x in os.getloadavg()]
        this_pass: dict[str, float] = {}
        for name in headline:
            fn = q[name]
            t = _timed(lambda: fn(spark, SF_DIR).collect())
            this_pass[name] = t
            if name not in timings or t < timings[name]:
                timings[name] = t
        # control right after the pass attributes THIS window.  3M hashes
        # per proc (~3 s quiet): a shorter burn is dominated by Pool-spawn
        # overhead and under-reads even quiet windows (~0.6 at 300k vs
        # ~0.97 at 3M, measured) — the clean/stolen verdict needs the
        # amortized number
        control = round(_burn_throughput(CPUS, 3_000_000) / (CPUS * 1e6), 3)
        is_clean = control >= STEAL_FRACTION * QUIET_REF
        clean_passes += is_clean
        passes.append(
            {
                "queries": this_pass,
                "loadavg_at_start": load_before,
                "control_mhash_per_core": control,
                "clean": is_clean,
            }
        )
    control_mhs = max(p["control_mhash_per_core"] for p in passes)

    # north-star throughput anchor: pages encoded + sketched per second
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    encode_s = timings["pprl_mask_documents"]
    sketch_s = timings["hll_distinct_users"]
    pages_per_sec = round(n_docs / max(encode_s + sketch_s, 1e-9), 1)

    total = round(sum(timings.values()), 3)
    core_total = round(sum(timings[n] for n in headline_core), 3)
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1] or SF_DIR
    result = {
        "metric": "headline query wall time (sf parquet, local mode)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # r1-r4 18-query sublist total — compare THIS against earlier
        # rounds' `value` (the full list grew in r5; BENCH.md ledger)
        "value_core18": core_total,
        "sf": sf_label,
        "cpus": CPUS,
        "pages_per_sec_encode_sketch": pages_per_sec,
        "noise": {
            "protocol": (
                "steal-aware best-of-k: pass is clean iff its same-window "
                "CPU control >= 0.5x quiet reference; re-run until 3 clean "
                "passes (max 6 total); min per query over ALL passes"
            ),
            "clean_passes": clean_passes,
            "total_passes": len(passes),
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            "cpu_control_mhash_per_core": control_mhs,
            # measured quiet-window value at 32 concurrent procs on this
            # box (the per-core throttle at full load already included);
            # readings well below this mean the window was stolen and the
            # wall numbers above are inflated accordingly
            "cpu_control_quiet_reference": 0.77,
            "passes": passes,
        },
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
    from pprl_spark.spark.lsh import LSHConfig
    from pprl_spark.spark.mask import mask_with_bands

    cores = int(master.split("[")[1].rstrip("]"))
    spark = _session(master)
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the Arrow-UDF worker pool so per-worker Python startup (~0.4 s
    # x cores) lands outside the timed window — on a real cluster workers
    # are long-lived
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(0, cores * 1000, numPartitions=cores).select(
        _warm(F.col("id"))
    ).count()
    pages = make_pages(spark, n_pages, partitions=cores * 4)
    pages.write.mode("overwrite").parquet("/tmp/pprl_bench_pages.parquet")
    # re-split explicitly: the whole synthetic table is a few hundred MB,
    # so the default 128 MB maxPartitionBytes would hand the scan ~4
    # splits and starve the encode stage of parallelism (a small-input
    # artifact — at production scale file count >> cores)
    pages_raw = spark.read.parquet("/tmp/pprl_bench_pages.parquet")
    # project BEFORE the parallelism-restoring exchange: html is dead weight
    # for the encode path and must not ride the shuffle (explicit, rather
    # than trusting pruning through a round-robin repartition)
    pages = pages_raw.select("url", "text").repartition(cores * 4)

    # Per-record salting (reference AttributeSalt-by-attribute semantics,
    # routers/mask.py:124-136) makes every hashed token unique per page —
    # token-digest memoization cannot kick in, exactly like real web text
    # where the token stream is heavy-tailed.  This keeps the benched job
    # dominated by the embarrassingly-parallel encode kernel rather than
    # fixture artifacts.
    from pprl_spark.config import AttributeSalt, StaticAttributeConfig

    cfg = MaskConfig(
        filter=CLKFilter(1024, 5),
        hash=HashConfig(HashFunctionConfig(("sha256", "md5")), "double_hash"),
        token_size=2,
        padding="_",
        prepend_attribute_name=False,
        attributes=(
            StaticAttributeConfig("text", AttributeSalt(attribute="id")),
        ),
    )
    start = time.monotonic()
    phases = {}
    # fused encode+band-signature UDF (one Python pass per record) →
    # parquet checkpoint: the production pipeline shape, one evaluation,
    # cleanly attributable
    encoded = mask_with_bands(
        pages.withColumnRenamed("url", "id"),
        cfg,
        LSHConfig(1024, 16, 12, seed=727),
        ["text"],
    )
    t0 = time.monotonic()
    encoded.write.mode("overwrite").parquet("/tmp/pprl_bench_encoded.parquet")
    phases["encode_sign"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    enc_df = spark.read.parquet("/tmp/pprl_bench_encoded.parquet")
    banded = enc_df.select("id", F.posexplode("bands").alias("band", "sig"))
    n_buckets = banded.groupBy("band", "sig").count().count()
    phases["bucket_agg"] = round(time.monotonic() - t0, 2)
    # sketches read their single column straight off the parquet scan —
    # feeding them the repartitioned frame would re-shuffle the whole
    # table (html included) once per sketch
    t0 = time.monotonic()
    hll = sketch_column(pages_raw.select("url"), "url", lambda: HyperLogLog(p=14))
    phases["hll"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    cms = sketch_column(pages_raw.select("lang"), "lang", lambda: CountMinSketch(2719, 5))
    phases["cms"] = round(time.monotonic() - t0, 2)
    wall = time.monotonic() - start
    out = {
        "master": master,
        "n_pages": n_pages,
        "phases": phases,
        "wall_sec": round(wall, 3),
        "pages_per_sec": round(n_pages / wall, 1),
        "distinct_urls_est": round(hll.estimate(), 1),
        "cms_total": cms.estimate(),
        "lsh_buckets": n_buckets,
    }
    spark.stop()
    return out


def _burn_throughput(procs: int, n: int = 3_000_000) -> float:
    """Pure-CPU control (sha256 chain per process, zero coordination):
    hashes/sec at ``procs`` concurrent processes.  This VM throttles
    per-core throughput when all cores are busy (~30%, BENCH.md), so the
    achievable N→4N scaling ceiling is BELOW 1.0 even for embarrassingly
    parallel work — Spark efficiency is judged against this ceiling, not
    against an ideal 4.0x."""
    import multiprocessing as mp

    t0 = time.monotonic()
    with mp.Pool(procs) as pool:
        pool.map(_mp_burn, [n] * procs)
    wall = time.monotonic() - t0
    return procs * n / wall


def _mp_burn(k: int) -> float:
    import hashlib

    d = b"x" * 64
    t0 = time.monotonic()
    for _ in range(k):
        d = hashlib.sha256(d).digest()
    return time.monotonic() - t0


def run_scaling(n_pages: int = 120_000, n_low: int = 8) -> dict:
    """Same job at local[N] and local[4N] in separate (cold) subprocesses,
    with an interleaved pure-CPU control at N and 4N processes measured in
    the same window — efficiency is reported both raw and as a fraction of
    the measured hardware ceiling (VERDICT r2 #9)."""
    low, high = f"local[{n_low}]", f"local[{n_low * 4}]"
    results = {}
    ceil_thpt: dict[int, float] = {}
    # interleave Spark runs and CPU controls, best-of-3 per level: the
    # sandbox VM shows ~30% run-to-run throughput noise (hypervisor
    # steal), and min-of-k / max-of-k is the standard de-noising for
    # wall-clock benchmarks.  The low/high Spark runs stay ADJACENT inside
    # each pass (so a steal window hits both or neither) and the CPU
    # controls run at the end of the pass, never between the two Spark
    # runs they normalize.
    pass_walls: dict[str, list] = {low: [], high: []}
    pass_controls: dict[int, list] = {n_low: [], n_low * 4: []}
    pass_loadavg: list = []
    for _pass in range(3):
        pass_loadavg.append([round(x, 2) for x in os.getloadavg()])
        for master in (low, high):
            proc = subprocess.run(
                [sys.executable, __file__, "--scaling-worker", master, str(n_pages)],
                capture_output=True,
                text=True,
                check=True,
            )
            run = json.loads(proc.stdout.strip().splitlines()[-1])
            pass_walls[master].append(run["wall_sec"])
            prev = results.get(master)
            if prev is None or run["wall_sec"] < prev["wall_sec"]:
                results[master] = run
        for procs in (n_low, n_low * 4):
            thpt = _burn_throughput(procs)
            pass_controls[procs].append(round(thpt / (procs * 1e6), 3))
            ceil_thpt[procs] = max(ceil_thpt.get(procs, 0.0), thpt)
    t_low = results[low]["wall_sec"]
    t_high = results[high]["wall_sec"]
    efficiency = round((t_low / t_high) / 4.0, 3)
    cpu_ceiling = round(ceil_thpt[n_low * 4] / (4.0 * ceil_thpt[n_low]), 3)
    # estimates must be identical across parallelism levels (merge invariance)
    est_equal = (
        results[low]["distinct_urls_est"] == results[high]["distinct_urls_est"]
        and results[low]["cms_total"] == results[high]["cms_total"]
    )
    return {
        "metric": f"scaling efficiency {low} -> {high} (N -> 4N cores)",
        "n_pages": n_pages,
        "low": results[low],
        "high": results[high],
        "speedup_n_to_4n": round(t_low / t_high, 3),
        "scaling_efficiency": efficiency,
        "cpu_control_ceiling": cpu_ceiling,
        "efficiency_vs_ceiling": round(min(efficiency / cpu_ceiling, 9.999), 3)
        if cpu_ceiling
        else None,
        "passes_north_rule_0_8": efficiency >= 0.8,
        "estimates_identical_across_parallelism": est_equal,
        # full per-pass evidence so a reader can see run-to-run variance
        # (steal windows) instead of only the best-of-3 (VERDICT r3 #4)
        "noise": {
            "pass_walls_sec": pass_walls,
            "pass_control_mhash_per_core": {
                str(k): v for k, v in pass_controls.items()
            },
            "loadavg_at_pass_start": pass_loadavg,
        },
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        print(json.dumps(scaling_job(sys.argv[2], int(sys.argv[3]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        out = run_scaling(n, n_low)
        with open("BENCH_SCALING.json", "w") as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out))
    else:
        print(json.dumps(run_headline()))
