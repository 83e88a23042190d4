"""Spot-benchmark the Stupid Backoff LM at driver-scale ×N inputs.

Synthesizes the standard pages fixture (512-word salad vocabulary →
near-worst-case gram-count cardinality: random trigrams are mostly
distinct, so the counts table is ~the token count), trains order-3
counts, then perplexity-scores the whole corpus through the join
cascade.  Reports walls + token throughput and the same-window CPU
control (see BENCH.md noise protocol).

Usage: python tools/bench_lm.py [n_pages] [master] [hash]
(third arg "hash" trains/scores with hash_grams=True — the 64-bit
shuffle-width knob — for an A/B against the exact string-keyed path)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _burn_throughput  # same-window CPU control

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
CORES = int(MASTER.split("[")[1].rstrip("]")) if "[" in MASTER else 32
HASH_GRAMS = len(sys.argv) > 3 and sys.argv[3] == "hash"


def main() -> None:
    from pprl_spark.fixtures import make_pages
    from pprl_spark.spark.lm import score_documents, train_stupid_backoff
    from pprl_spark.spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("bench-lm", master=MASTER)
    path = "/tmp/pprl_bench_lm_pages.parquet"
    make_pages(spark, N_PAGES, partitions=CORES * 4).write.mode(
        "overwrite"
    ).parquet(path)
    docs = (
        spark.read.parquet(path)
        .select(F.xxhash64("url").alias("doc_id"), "text")
        .repartition(CORES * 4)
    )
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("n")
    ).first()["n"]

    t0 = time.time()
    counts = train_stupid_backoff(docs, hash_grams=HASH_GRAMS)
    n_grams = counts.count()  # forces the localCheckpoint materialization
    train_s = time.time() - t0

    t0 = time.time()
    scored = score_documents(docs, counts)
    agg = scored.agg(
        F.count(F.lit(1)).alias("docs"), F.avg("perplexity").alias("avg_px")
    ).first()
    score_s = time.time() - t0

    control = round(_burn_throughput(CORES, 3_000_000) / (CORES * 1e6), 3)
    print(
        json.dumps(
            {
                "metric": "stupid_backoff train+score wall",
                "n_pages": N_PAGES,
                "n_tokens": int(n_tokens),
                "n_gram_rows": int(n_grams),
                "train_s": round(train_s, 1),
                "score_s": round(score_s, 1),
                "train_tokens_per_sec": round(n_tokens / train_s),
                "score_tokens_per_sec": round(n_tokens / score_s),
                "scored_docs": int(agg["docs"]),
                "avg_perplexity": round(float(agg["avg_px"]), 2),
                "master": MASTER,
                "hash_grams": HASH_GRAMS,
                "cpu_control_mhash_per_core": control,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
