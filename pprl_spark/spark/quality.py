"""Config-driven document quality filtering for training-data curation.

Composes the text-analysis signals (token counts, heuristic quality,
language-ID — spark/textstats.py) with Gopher-style repetition signals
(Rae et al. 2021 §A1.1: duplicate-word / duplicate-line / top-n-gram
fractions) into a single ``keep``/``reject_reason`` decision per
document — the filter stage every large-scale pipeline runs between
ingestion and dedup.

Scale notes:

* ``dup_word_fraction`` / ``dup_line_fraction`` are pure Catalyst column
  expressions (``array_distinct`` is linear in document length, no
  shuffle).
* ``top_bigram_fraction`` needs a per-document mode, which would be
  quadratic as a column expression — it is computed by explode →
  two-level hash aggregate keyed on (id, bigram) → join back: one
  shuffle of slim (id, bigram-hash-sized) rows, uniform keys, linear
  work.  At 100 TB this is the same shape as the tokenize/tf pass the
  pipeline already runs.
* The filter itself is a pure projection over those signals — predicate
  pushdown applies to any upstream scan, and ``keep`` can drive
  partition-pruning writes (``partitionBy("keep")``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import lang_id_col, quality_score, whitespace_token_count

__all__ = [
    "FilterRules",
    "dup_word_fraction",
    "dup_line_fraction",
    "top_bigram_fraction",
    "top_bigram_fraction_udf",
    "repetition_stats",
    "filter_documents",
    "streaming_quality_filter",
]


def _words(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def dup_word_fraction(col: Column | str) -> Column:
    """1 − distinct/total over whitespace words (0.0 for empty text) —
    high values mean the document repeats its own vocabulary."""
    col = F.col(col) if isinstance(col, str) else col
    w = _words(col)
    n = F.size(w)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (F.lit(1.0) - F.size(F.array_distinct(w)) / n).cast("double")
    )


def dup_line_fraction(col: Column | str) -> Column:
    """1 − distinct/total over newline-split lines (0.0 when ≤1 line)."""
    col = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(col, r"\n"), lambda s: F.trim(s) != "")
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (F.lit(1.0) - F.size(F.array_distinct(lines)) / n).cast("double")
    )


def _top_bigram_per_doc(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Sparse (id, top_bigram_fraction) — only documents with ≥1 bigram
    appear; callers left-join and coalesce to 0.0.  Linear explode + hash
    aggregate, never a per-document quadratic scan."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n = F.size(words)
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) and element_at(_, 0)
    # throws under ANSI — docs with < 2 words must short-circuit to []
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(F.col(id_col), F.explode(bigrams).alias("__bg"))
    per_bigram = exploded.groupBy(id_col, "__bg").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_bigram.groupBy(id_col).agg(
        (F.max("__n") / F.sum("__n")).cast("double").alias("top_bigram_fraction")
    )


def top_bigram_fraction(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, top_bigram_fraction) for EVERY input id: the most frequent
    word-bigram's share of all bigrams, 0.0 for documents with fewer than
    two words."""
    per_doc = _top_bigram_per_doc(df, id_col, text_col)
    ids = df.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("top_bigram_fraction", F.lit(0.0)).alias("top_bigram_fraction"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach the three Gopher-style repetition signals.  The bigram
    aggregate joins back LEFT against the full rows directly (sparse side
    broadcastable), so the corpus is scanned twice total — once for the
    narrow signals, once for the bigram explode — with no third
    ids-distinct pass."""
    narrow = df.withColumns(
        {
            "dup_word_fraction": dup_word_fraction(F.col(text_col)),
            "dup_line_fraction": dup_line_fraction(F.col(text_col)),
        }
    )
    tops = _top_bigram_per_doc(df, id_col, text_col)
    return narrow.join(tops, id_col, "left").withColumn(
        "top_bigram_fraction",
        F.coalesce("top_bigram_fraction", F.lit(0.0)),
    )


@dataclass(frozen=True)
class FilterRules:
    """Thresholds for :func:`filter_documents`; the reject reason is the
    FIRST failing rule in declaration order."""

    min_tokens: int = 5
    max_tokens: int = 1_000_000
    min_quality: float = 0.0
    allowed_langs: tuple = ()  # empty = any language passes
    max_dup_word_fraction: float = 1.0
    max_top_bigram_fraction: float = 1.0


def filter_documents(
    df: DataFrame,
    rules: FilterRules = FilterRules(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-filter decision per document: signals + ``keep`` boolean +
    ``reject_reason`` ('ok' when kept — NULL-free by design so the frame
    survives engine-comparison hashing)."""
    sig = repetition_stats(df, id_col, text_col).withColumns(
        {
            "n_tokens": whitespace_token_count(F.col(text_col)),
            "quality": quality_score(F.col(text_col)),
            "lang_pred": lang_id_col(F.col(text_col)),
        }
    )
    return _decide(sig, rules)


def _reason_column(rules: FilterRules) -> Column:
    """First-failing-rule CASE chain over the signal columns."""
    reason = F.when(F.col("n_tokens") < rules.min_tokens, F.lit("too_short"))
    reason = reason.when(F.col("n_tokens") > rules.max_tokens, F.lit("too_long"))
    reason = reason.when(F.col("quality") < rules.min_quality, F.lit("low_quality"))
    if rules.allowed_langs:
        reason = reason.when(
            ~F.col("lang_pred").isin(*rules.allowed_langs), F.lit("lang")
        )
    reason = reason.when(
        F.col("dup_word_fraction") > rules.max_dup_word_fraction,
        F.lit("repetition_words"),
    )
    reason = reason.when(
        F.col("top_bigram_fraction") > rules.max_top_bigram_fraction,
        F.lit("repetition_bigram"),
    )
    return reason.otherwise(F.lit("ok"))


def _decide(sig: DataFrame, rules: FilterRules) -> DataFrame:
    return sig.withColumn("reject_reason", _reason_column(rules)).withColumn(
        "keep", F.col("reject_reason") == "ok"
    )


def top_bigram_fraction_udf(col: Column | str) -> Column:
    """Per-row top-bigram fraction as an Arrow-vectorized scalar UDF —
    the STATELESS-PROJECTION form of :func:`top_bigram_fraction` for
    streaming plans, where the batch explode + re-join shape would be a
    stream-stream self-join.  Linear per document (collections.Counter),
    identical values to the batch aggregate."""
    col = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("double")
    def _tbf(texts: pd.Series) -> pd.Series:
        from collections import Counter

        out = []
        for t in texts:
            words = [w for w in (t or "").split() if w]
            if len(words) < 2:
                out.append(0.0)
                continue
            counts = Counter(zip(words, words[1:]))
            out.append(max(counts.values()) / (len(words) - 1))
        return pd.Series(out, dtype="float64")

    return _tbf(col)


def streaming_quality_filter(
    stream_df: DataFrame,
    rules: FilterRules = FilterRules(),
    text_col: str = "text",
) -> DataFrame:
    """Quality filter over a STREAMING DataFrame — the ingest-time stage
    of a continuously-crawled corpus pipeline (filter → dedup → encode).

    Every signal here is a stateless projection, so the plan composes
    with watermarks/sinks unchanged and needs no state store: the
    Catalyst expressions are shared with batch; ``top_bigram_fraction``
    switches to its vectorized-UDF form (the batch aggregate shape would
    be a stream-stream self-join).  Decisions are row-identical to
    :func:`filter_documents` on the same rows."""
    if not stream_df.isStreaming:
        raise ValueError("streaming_quality_filter expects a streaming DataFrame")
    sig = stream_df.withColumns(
        {
            "dup_word_fraction": dup_word_fraction(F.col(text_col)),
            "dup_line_fraction": dup_line_fraction(F.col(text_col)),
            "top_bigram_fraction": top_bigram_fraction_udf(F.col(text_col)),
            "n_tokens": whitespace_token_count(F.col(text_col)),
            "quality": quality_score(F.col(text_col)),
            "lang_pred": lang_id_col(F.col(text_col)),
        }
    )
    return _decide(sig, rules)
