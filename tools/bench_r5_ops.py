"""Round-5 operator spot-benchmarks: pagerank, boilerplate removal,
PII redaction, WARC ingest.  Single-run walls at driver-scale ×100-1000
inputs, CPU control printed for window attribution (cf. bench.py).

Usage: python tools/bench_r5_ops.py [op ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f}s  ({out})", flush=True)


def main():
    only = set(sys.argv[1:])
    from pprl_spark.spark.session import get_spark

    spark = get_spark("bench-r5-ops")
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", os.getloadavg(), flush=True)

    if not only or "pagerank" in only:
        from pprl_spark.spark.graph import pagerank

        # 5M edges over 1M nodes, Zipf-ish hub skew on the dst side
        e = spark.range(5_000_000).select(
            (F.col("id") % 1_000_000).alias("src_host"),
            (F.xxhash64("id") % 1_000_000).alias("dst_host"),
        ).where(F.col("src_host") != F.col("dst_host"))
        timed(
            "pagerank 5M edges / 1M nodes, 10 iters",
            lambda: pagerank(e, iterations=10)
            .agg(F.sum("rank"), F.count(F.lit(1))).first(),
        )

    if not only or "boilerplate" in only:
        from pprl_spark.spark.webtext import remove_boilerplate_lines

        # 500k docs, 200 domains, 12 lines each: 2 domain-boilerplate
        # lines + 10 unique lines
        docs = spark.range(500_000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("d"), (F.col("id") % 200).cast("string")).alias("domain"),
            F.concat(
                F.lit("nav home products about for domain "),
                (F.col("id") % 200).cast("string"),
                F.lit("\ncookie banner for domain "),
                (F.col("id") % 200).cast("string"),
                *[
                    x
                    for k in range(10)
                    for x in (
                        F.lit(f"\nunique line {k} of doc "),
                        F.col("id").cast("string"),
                    )
                ],
            ).alias("text"),
        )
        timed(
            "boilerplate 500k docs x 12 lines, 200 domains",
            lambda: remove_boilerplate_lines(docs, domain_col="domain")
            .agg(F.sum("n_lines_removed"), F.sum(F.length("text"))).first(),
        )

    if not only or "redact" in only:
        from pprl_spark.spark.pii import redact_pii

        docs = spark.range(1_000_000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("lorem ipsum dolor sit amet " * 8),
                F.lit("mail user"), F.col("id").cast("string"),
                F.lit("@example.org from 10.1."),
                (F.col("id") % 256).cast("string"),
                F.lit(".9 call 555-123-4567 ssn 123-45-6789 "),
                F.lit("consectetur adipiscing elit sed do " * 6),
            ).alias("text"),
        )
        timed(
            "redact_pii 1M docs (~430B each, 4 kinds)",
            lambda: redact_pii(docs)
            .agg(
                F.sum("pii_email"), F.sum("pii_ipv4"),
                F.sum("pii_ssn"), F.sum("pii_phone"),
                F.sum(F.length("text")),
            ).first(),
        )

    if not only or "spans" in only:
        from pprl_spark.spark.substring import duplicate_span_stats

        # 100k docs ~800B each; every 50th doc quotes a shared passage
        passage = "shared verbatim passage that should be fingerprinted "
        docs = spark.range(100_000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("prefix prose " * 20),
                F.when(F.col("id") % 50 == 0, F.lit(passage * 3))
                .otherwise(F.concat(F.lit("unique body "), F.col("id").cast("string"), F.lit(" "))),
                F.lit("suffix prose " * 20),
            ).alias("text"),
        )
        timed(
            "duplicate_span_stats 100k docs (~80MB text, k=25 w=25)",
            lambda: duplicate_span_stats(docs)
            .agg(
                F.sum("n_fingerprints"),
                F.sum((F.col("dup_fraction") > 0).cast("long")),
            ).first(),
        )

    if not only or "warc" in only:
        import tempfile

        from pprl_spark.fixtures import make_pages_local, make_warc_bytes
        from pprl_spark.io.warc import read_warc
        from pprl_spark.spark.webtext import extract_text_col

        tmp = tempfile.mkdtemp(prefix="warc_bench_")
        rows = make_pages_local(40_000)
        per = 2_500
        for i in range(0, len(rows), per):
            with open(os.path.join(tmp, f"f{i}.warc.gz"), "wb") as fh:
                fh.write(make_warc_bytes(rows[i:i + per], gz=True))
        timed(
            "read_warc 40k pages / 16 .warc.gz files + extract_text",
            lambda: read_warc(spark, tmp)
            .select(extract_text_col(F.col("html")).alias("t"))
            .agg(F.sum(F.length("t")), F.count(F.lit(1))).first(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
