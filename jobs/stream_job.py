"""Composed Structured-Streaming job: continuously-arriving pages →
quality filter (stateless projection, r4) → optional frozen-blocklist
boilerplate removal (stream-static broadcast join, r5) + benchmark
decontamination + Stupid-Backoff perplexity filter (broadcast-model
stateless projections, r5) → exact dedup (watermark-bounded state) →
optional PII redaction (pure-Catalyst projection, r5) →
CLK encode → parquet sink — the streaming counterpart of
jobs/dedup_job.py's batch curation stages.

Launch (sandbox):
    python jobs/stream_job.py --src /tmp/pages_in --out /tmp/stream_out \
        --ckpt /tmp/stream_ckpt [--once]

The source directory is watched for parquet files with the pages schema
(url string, text string, lang string, ts timestamp).  ``--once`` runs
an availableNow pass and exits (the smoke/test mode); without it the
query runs until interrupted.  Restarting with the same --ckpt resumes
from the checkpointed offsets and state — dedup decisions and sketch
registers carry over.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


PAGES_SCHEMA = "url string, text string, lang string, ts timestamp"


def build_query(spark, src: str, out: str, ckpt: str, once: bool,
                rules=None, eval_src: str | None = None,
                decontaminate_n: int = 13,
                lm_counts: str | None = None,
                lm_max_perplexity: float = 1e6,
                redact: bool = False,
                boilerplate_src: str | None = None):
    from pprl_spark.config import (CLKFilter, HashConfig, HashFunctionConfig,
                                   MaskConfig)
    from pprl_spark.spark.decontaminate import streaming_decontaminate
    from pprl_spark.spark.lm import counts_to_local, streaming_perplexity_filter
    from pprl_spark.spark.quality import FilterRules
    from pprl_spark.streaming import (streaming_dedup_exact, streaming_mask,
                                      streaming_quality_filter)

    cfg = MaskConfig(
        filter=CLKFilter(1024, 3),
        hash=HashConfig(HashFunctionConfig(("sha256",)), "double_hash"),
        token_size=4,
        padding="_",
        prepend_attribute_name=False,
    )
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    # permissive defaults: the stage is always in the plan (stateless
    # projection), the caller tightens thresholds per corpus
    filtered = (
        streaming_quality_filter(stream, rules or FilterRules(min_tokens=0))
        .where("keep")
        .select("url", "text", "lang", "ts")
    )
    if boilerplate_src is not None:
        # frozen-blocklist boilerplate removal (r5): the blocklist is a
        # batch artifact (boilerplate_line_stats filtered by the batch
        # job's thresholds, columns domain/line_hash/n_docs) broadcast
        # into a stream-static join — line spread is corpus-global, so
        # no bounded stream state could compute it online
        from pprl_spark.spark.webtext import streaming_remove_boilerplate

        filtered = streaming_remove_boilerplate(
            filtered, spark.read.parquet(boilerplate_src)
        ).select("url", "text", "lang", "ts")
    if eval_src is not None:
        # benchmark decontamination at ingest (r5): a stateless
        # broadcast-set membership stage, mirroring the batch
        # decontaminate() stage of jobs/dedup_job.py
        filtered = streaming_decontaminate(
            filtered, spark.read.parquet(eval_src), "text", n=decontaminate_n
        )
    if lm_counts is not None:
        # CCNet-style LM perplexity filter at ingest (r5): the trained
        # Stupid Backoff counts (jobs/lm via `pprl-spark lm-train` or the
        # batch job's lm stage) broadcast once; scoring is a stateless
        # Arrow-batched projection, batch≡stream decision-equal
        filtered = (
            streaming_perplexity_filter(
                filtered,
                counts_to_local(spark.read.parquet(lm_counts)),
                max_perplexity=lm_max_perplexity,
            )
            .where("keep_lm")
            .select("url", "text", "lang", "ts")
        )
    deduped = streaming_dedup_exact(filtered, "text", "ts", watermark="2 hours")
    pii_cols = []
    if redact:
        # PII scrub AFTER dedup (so redaction can't perturb the dedup
        # key) and BEFORE encode (so PII never enters the CLK bloom
        # either) — redact_pii is a pure Catalyst projection, so the
        # batch operator streams as-is, no stateful variant needed
        from pprl_spark.spark.pii import PII_PATTERNS, redact_pii

        deduped = redact_pii(deduped)
        pii_cols = [f"pii_{k}" for k in PII_PATTERNS]
    encoded = streaming_mask(
        deduped.withColumnRenamed("url", "id"), cfg, ["text"],
        keep_cols=tuple(pii_cols),
    ).select("id", "bloom", *pii_cols)
    writer = (
        encoded.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--eval-src", default=None,
                    help="parquet dir of benchmark docs (text column); "
                    "enables the decontamination stage")
    ap.add_argument("--lm-counts", default=None,
                    help="parquet dir of Stupid Backoff counts "
                    "(pprl-spark lm-train); enables the perplexity filter")
    ap.add_argument("--lm-max-perplexity", type=float, default=1e6)
    ap.add_argument("--redact", action="store_true",
                    help="PII-scrub the deduped stream before encoding")
    ap.add_argument("--boilerplate-src", default=None,
                    help="parquet blocklist (domain, line_hash, n_docs) "
                    "from the batch boilerplate stats; enables frozen-"
                    "blocklist line removal")
    args = ap.parse_args()

    from pprl_spark.spark.session import get_spark

    spark = get_spark("stream-job", master=args.master)
    q = build_query(spark, args.src, args.out, args.ckpt, args.once,
                    eval_src=args.eval_src, lm_counts=args.lm_counts,
                    lm_max_perplexity=args.lm_max_perplexity,
                    redact=args.redact,
                    boilerplate_src=args.boilerplate_src)
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
