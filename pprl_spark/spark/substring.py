"""Exact substring-level duplication detection via winnowing
fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms
for Document Fingerprinting", SIGMOD 2003) — the span-level complement
of whole-document near-dup (spark/dedup.py): training corpora carry
long VERBATIM passages (licenses, quotes, templated pages) inside
otherwise-distinct documents, and suffix-array dedup à la Lee et al.
2022 exists precisely to catch them.  Winnowing gives the same
guarantee class without a distributed suffix array:

* every k-gram (character window of length ``k``) gets a rolling hash;
* each sliding window of ``w`` consecutive k-gram hashes selects its
  MINIMUM (rightmost on ties — the robust-winnowing choice);
* the selected (hash, position) pairs are the document's fingerprints.

GUARANTEE: any substring shared verbatim by two documents with length
>= w + k - 1 contributes at least one IDENTICAL selected hash in both —
selection depends only on the shared bytes, so alignment is
content-anchored (no strided-sampling miss).  Density is ~2/(w+1)
fingerprints per character, the proven lower bound for any local
scheme.

Scale shape: fingerprinting is one Arrow-batched pandas UDF (the
rolling hash + windowed argmin are vectorized numpy over the whole
batch — no per-character Python), producing array<struct<h,pos>> per
doc; only slim exploded (hash, doc_id, pos) rows reach the one
exchange (groupBy hash), with text never shuffling; a hot-hash cap
(``max_docs_per_hash``) bounds pathological fingerprints (the all-'a'
page) exactly like dedup.py's LSH bucket cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "duplicate_spans", "duplicate_span_stats"]

#: prime modulus chosen so one Horner step never overflows uint64:
#: h < M, h*B + 255 < (2^56-5)*131 + 255 < 2^64.  56-bit hashes: ~a
#: handful of birthday collisions corpus-wide at 10^9 fingerprints,
#: each at worst one false candidate pair for the verifier.
_MOD = (1 << 56) - 5
_BASE = 131


def _horner(b: np.ndarray, k: int) -> np.ndarray:
    """Rolling k-byte polynomial hashes of a byte array (positions
    0..len-k): Horner over the k byte lanes, one vectorized
    multiply-add-mod over all positions per lane.  The plain ``%`` is
    deliberate: a shift/mask reduction for 2^56-5 was tried (r6) and ran
    3x SLOWER on large arrays — its ~7 temporaries per step make the
    pass memory-bound, while numpy's scalar uint64 divide pipelines
    fine."""
    n = len(b)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        h = (h * np.uint64(_BASE) + b[j:n - k + 1 + j]) % np.uint64(_MOD)
    return h


def _winnow_numpy(text: str, k: int, w: int) -> "list[tuple[int, int]]":
    """Selected (hash, pos) fingerprints of one string — vectorized."""
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    # k applies to the utf-8 BYTE stream; positions are byte offsets
    # (identical across both docs of any shared byte run)
    n = len(b)
    if n < k:
        return []
    h = _horner(b, k)
    m = len(h)
    if m <= w:
        pos = m - 1 - int(np.argmin(h[::-1].copy()))  # rightmost minimum
        return [(int(h[pos]), pos)]
    # windowed minimum with rightmost tie-break: argmin (which takes the
    # FIRST minimum) over windows of the REVERSED array picks the
    # rightmost min of the corresponding forward window; reversed window
    # j starts at forward index m-w-j, and reversed absolute index j+rel
    # maps back to forward index m-1-(j+rel)
    # contiguous copy before the windowed argmin: argmin over a
    # negative-stride view leaves numpy's fast path (r6 measured 6.4x)
    win = np.lib.stride_tricks.sliding_window_view(h[::-1].copy(), w)
    rel = np.argmin(win, axis=1)
    picked = (m - 1) - (np.arange(m - w + 1) + rel)
    sel = np.unique(picked)
    # degenerate-run compression (the tie case Schleimer's "robust
    # winnowing" exists for): on a constant byte run every window's
    # rightmost-min is a NEW position, one selection per window.  Keep
    # only the first of any run of equal-hash selections closer than w
    # apart — at least one instance of each hash survives per run, so
    # the cross-document guarantee is untouched, and density on
    # degenerate text drops from 1/window back to ~1/run.
    if len(sel) > 1:
        hp = h[sel]
        keep = np.ones(len(sel), dtype=bool)
        keep[1:] = ~((hp[1:] == hp[:-1]) & (np.diff(sel) < w))
        sel = sel[keep]
    return [(int(h[p]), int(p)) for p in sel]


def winnow_fingerprints(
    col: Column | str, k: int = 25, w: int = 25
) -> Column:
    """``array<struct<h long, pos int>>`` winnowing fingerprints of a
    text column (Arrow-batched; numpy-vectorized per document).  Any
    verbatim byte run of length >= w + k - 1 (default 49) shared by two
    texts yields an identical ``h`` in both.

    A whole-batch concatenated engine (gap sentinels + one global
    Horner/argmin pass) was built and parity-proven in r6 but ran
    ~1.4x SLOWER than this per-document form once the reversed-view
    argmin was made contiguous (420 vs 300 µs/doc on 800 B docs) — the
    r5 "per-doc overhead dominates" hypothesis did not survive
    measurement, so the simpler engine stays."""
    if k < 2 or w < 1:
        raise ValueError(f"need k >= 2 and w >= 1, got k={k} w={w}")

    @F.pandas_udf("array<struct<h: long, pos: int>>")
    def _fp(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else [
                {"h": hv, "pos": p} for hv, p in _winnow_numpy(t, k, w)
            ]
        )

    c = F.col(col) if isinstance(col, str) else col
    return _fp(c)


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 25,
    max_docs_per_hash: int = 1000,
) -> DataFrame:
    """Cross-document duplicated spans: every winnowing fingerprint
    shared by >= 2 documents, as ``(h, n_docs, doc_id, pos)`` — one row
    per occurrence, the span-level dedup worklist (feed the doc pairs
    to exact verification, or cut the spans).  Self-repeats inside one
    document don't count toward ``n_docs`` (distinct doc spread, like
    boilerplate_line_stats).

    ``max_docs_per_hash`` drops degenerate fingerprints shared by more
    documents than the cap (the empty-ish/templated extreme) — logged
    semantics, not silent: the cap column is available upstream via
    :func:`duplicate_span_stats`."""
    fps = df.select(
        F.col(id_col), winnow_fingerprints(F.col(text_col), k, w).alias("__fp")
    )
    # split the UDF stage from the explode consumers (chained-UDF trap)
    occ = (
        fps.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .select(id_col, F.explode("__fp").alias("f"))
        .select(id_col, F.col("f.h").alias("h"), F.col("f.pos").alias("pos"))
    )
    spread = (
        occ.select("h", id_col).distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
        .where(
            (F.col("n_docs") >= 2) & (F.col("n_docs") <= max_docs_per_hash)
        )
    )
    return occ.join(spread, "h").select("h", "n_docs", id_col, "pos")


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 25,
) -> DataFrame:
    """Per-document duplication profile: total fingerprints and how many
    are shared with at least one other document — ``dup_fraction`` is
    the Lee-et-al-style \"fraction of the document that is verbatim
    duplicated elsewhere\" signal, cheap enough to run corpus-wide."""
    fps = df.select(
        F.col(id_col), winnow_fingerprints(F.col(text_col), k, w).alias("__fp")
    )
    occ = (
        fps.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .select(id_col, F.explode("__fp").alias("f"))
        .select(id_col, F.col("f.h").alias("h"))
    )
    spread = (
        occ.select("h", id_col).distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("__nd"))
    )
    per_doc = (
        occ.join(spread, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum((F.col("__nd") >= 2).cast("long")).alias("n_shared"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        F.when(
            F.coalesce(F.col("n_fingerprints"), F.lit(0)) > 0,
            F.col("n_shared") / F.col("n_fingerprints"),
        ).otherwise(F.lit(0.0)).cast("double").alias("dup_fraction"),
    )
