"""End-to-end staged dedup job: stats → fingerprint/pairs → components →
canonical map, checkpointed and resumable — the training-data-pipeline
counterpart of jobs/pprl_job.py.

Launch (cluster):
    spark-submit --py-files pprl_spark.zip jobs/dedup_job.py \
        --docs /path/documents.parquet --workdir /ckpt/dedup1

Launch (sandbox):
    python jobs/dedup_job.py --docs /root/testdata/sf0.001/documents.parquet \
        --workdir /tmp/dedup_run

Stage graph (each a parquet checkpoint with lineage + metrics):

    stats      documents → full quality-filter decision (token band,
               heuristic quality, Gopher repetition signals, language —
               spark/quality.filter_documents); only kept docs enter dedup
    pairs      MinHash-LSH candidates → exact-Jaccard-verified near-dup
               edges (slim (id_a, id_b, jaccard) rows)
    components large-star/small-star connected components over the edges
    canonical  every kept doc → its cluster representative (min doc_id),
               plus is_canonical / cluster_size — the table a training
               pipeline joins against to drop duplicates
    shards     canonical representatives packed into ~token-budget shards
               (spark/packing.assign_shards, distributed prefix sum) —
               the final write layout for training

Re-running with the same workdir resumes from completed stages; changing
a stage's config (e.g. the Jaccard threshold) invalidates it and every
downstream stage via the lineage fingerprint.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def build_stages(docs_path: str, q: int, threshold: float, min_quality: float,
                 shard_budget: int = 2000):
    from pprl_spark.spark.dedup import jaccard_verify, minhash_lsh_pairs
    from pprl_spark.spark.graph import assign_components
    from pprl_spark.spark.packing import assign_shards
    from pprl_spark.spark.pipeline import Stage
    from pprl_spark.spark.quality import FilterRules, filter_documents

    def stats(spark, inputs):
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        decided = filter_documents(docs, FilterRules(min_quality=min_quality))
        return decided.where(F.col("keep"))

    def pairs(spark, inputs):
        docs = inputs["stats"].select("doc_id", "text")
        cands = minhash_lsh_pairs(docs, "doc_id", "text", q=q,
                                  num_hashes=128, bands=16,
                                  max_bucket_size=1000)
        return jaccard_verify(cands, docs, "doc_id", "text", q=q,
                              threshold=threshold)

    def components(spark, inputs):
        docs = inputs["stats"].select("doc_id")
        edges = inputs["pairs"].select("id_a", "id_b")
        return assign_components(docs, "doc_id", edges)

    def canonical(spark, inputs):
        comp = inputs["components"]
        sizes = comp.groupBy("component").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        return (
            comp.join(sizes, "component")
            .select(
                "doc_id",
                F.col("component").alias("canonical_doc_id"),
                (F.col("doc_id") == F.col("component")).alias("is_canonical"),
                "cluster_size",
            )
        )

    def shards(spark, inputs):
        keep = inputs["canonical"].where(F.col("is_canonical")).select("doc_id")
        docs = inputs["stats"].select("doc_id", "n_tokens")
        kept = docs.join(keep, "doc_id")
        return assign_shards(kept, "doc_id", "n_tokens", budget=shard_budget)

    return [
        Stage("stats", stats, config={"docs": docs_path,
                                      "min_quality": min_quality}),
        Stage("pairs", pairs, inputs=("stats",),
              config={"q": q, "threshold": threshold,
                      "num_hashes": 128, "bands": 16}),
        Stage("components", components, inputs=("stats", "pairs")),
        Stage("canonical", canonical, inputs=("components",)),
        Stage("shards", shards, inputs=("stats", "canonical"),
              config={"budget": shard_budget}),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--q", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--shard-budget", type=int, default=2000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pprl_spark.spark.pipeline import Pipeline
    from pprl_spark.spark.session import get_spark

    spark = get_spark("dedup-job", master=args.master)
    pipeline = Pipeline(
        spark, args.workdir,
        build_stages(args.docs, args.q, args.threshold, args.min_quality,
                     shard_budget=args.shard_budget),
    )
    results = pipeline.run()
    canon = results["canonical"]
    shard_summary = results["shards"].agg(
        F.countDistinct("shard").alias("n_shards"),
        F.sum("n_tokens").alias("total_tokens"),
    ).first().asDict()
    summary = canon.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("is_canonical").cast("long")).alias("canonical_docs"),
        F.max("cluster_size").alias("largest_cluster"),
    ).first().asDict()
    print(json.dumps({"summary": summary, "shards": shard_summary,
                      "metrics": pipeline.metrics()},
                     indent=2, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
