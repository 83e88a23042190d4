"""Text-analysis operators for training-data pipelines.

Everything — token counting, quality scoring, fingerprinting, and the
stopword-profile language-ID — is pure Catalyst column expressions (JVM,
whole-stage-friendly, DuckDB-oracle-expressible).  No Python workers in
any of these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "whitespace_token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "content_fingerprint",
    "rolling_fingerprints",
    "lang_id_col",
    "with_text_stats",
    "tf_idf_terms",
    "bm25_scores",
]

# A BPE-ish pre-tokenization: word pieces, numbers, and single punctuation
# marks (GPT-2-style pre-tokenizer shape, simplified to a portable regex).
_BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "de", "et", "des", "est", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "es", "por", "para"],
    "pt": ["o", "a", "os", "de", "que", "e", "em", "é", "por", "para"],
    "it": ["il", "la", "di", "che", "e", "in", "è", "per", "con", "non"],
    "nl": ["de", "het", "een", "van", "en", "is", "dat", "op", "te", "voor"],
    "sv": ["och", "att", "det", "som", "en", "är", "av", "för", "på", "med"],
}

ALL_STOPWORDS = sorted({w for ws in _STOPWORDS.values() for w in ws})


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and hand it to ``fn`` as a bound
    lambda variable.  Higher-order functions are CodegenFallback: a free
    subtree (e.g. split+filter) referenced N times inside one expression
    — including once per element of a ``transform`` window loop — is
    re-evaluated interpreted each time, turning window construction
    quadratic.  Wrapping the subtree in a one-element array and
    referencing the ``transform`` lambda variable makes every reference a
    variable read (r5: cut the quality_filter plan from 42 ``split(``
    nodes to 7 and the n-gram explode child from O(lanes·words²) to
    O(lanes·words))."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def whitespace_token_count(col: Column | str) -> Column:
    col = _as_col(col)
    return F.size(F.filter(F.split(col, r"\s+"), lambda w: w != "")).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens via regexp_count — JVM-side."""
    return F.regexp_count(_as_col(col), F.lit(_BPE_ISH)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    col = _as_col(col)
    return (
        F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]"))
        / F.greatest(F.length(col), F.lit(1))
    ).cast("double")


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are (any-language) stopwords."""
    words = F.filter(F.split(F.lower(_as_col(col)), r"\s+"), lambda w: w != "")
    sw = F.array(*[F.lit(w) for w in ALL_STOPWORDS])
    return bind_once(
        words,
        lambda ws: (
            F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
            / F.greatest(F.size(ws), F.lit(1))
        ).cast("double"),
    )


def quality_score(
    col: Column | str,
    n_words: Column | None = None,
    punct: Column | None = None,
) -> Column:
    """Heuristic document quality in [0,1]: length band + moderate
    punctuation + mean word length band.  Deliberately simple, fully
    SQL-expressible (oracle-checkable).

    ``n_words`` / ``punct`` may be supplied when the caller already has
    the whitespace token count / punctuation ratio (e.g. a fused signal
    struct sharing one split — quality._scalar_signals — or a projection
    that also outputs them); they must equal
    :func:`whitespace_token_count` / :func:`punct_ratio` of the same
    column.  Passing them avoids re-running the split / regexp_count,
    which CollapseProject would otherwise inline once per use."""
    col = _as_col(col)
    n_chars = F.length(col)
    if n_words is None:
        n_words = whitespace_token_count(col)
    if punct is None:
        punct = punct_ratio(col)
    mean_word = n_chars / F.greatest(n_words, F.lit(1))
    len_ok = F.when((n_chars >= 20) & (n_chars <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    word_ok = F.when((mean_word >= 2.5) & (mean_word <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return ((len_ok + punct_ok + word_ok) / F.lit(3.0)).cast("double")


def content_fingerprint(col: Column | str) -> Column:
    """64-bit whole-document fingerprint of whitespace-normalized text."""
    normalized = F.concat_ws(" ", F.filter(F.split(_as_col(col), r"\s+"), lambda w: w != ""))
    return F.xxhash64(normalized)


def rolling_fingerprints(col: Column | str, window: int = 4) -> Column:
    """array<long> Rabin–Karp-style rolling fingerprints over word
    ``window``-grams (shingle fingerprints for containment detection) —
    pure Catalyst: slide over the word array and hash each window."""
    words = F.filter(F.split(_as_col(col), r"\s+"), lambda w: w != "")

    def _windows(ws: Column) -> Column:
        # ws binds the split array once per row (see bind_once) — as a
        # free subtree it would be re-split at every window (O(words²))
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(ws) - (window - 1), F.lit(1))
        )
        return F.transform(
            starts, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, window)))
        )

    return bind_once(words, _windows)


def lang_id_col(col: Column | str) -> Column:
    """Heuristic language-ID as a pure Catalyst expression (no Python
    worker, DuckDB-oracle-expressible): per language, count the occurrences
    of its stopwords among the lowercased whitespace words; predict the
    first (alphabetically) language with the maximal score, 'und' on zero
    evidence or empty/null text.  Semantics match the former vectorized-UDF
    implementation (counts × membership profile, argmax-first).

    Shaped as ONE ``aggregate`` over the word array with the argmax in
    the finish lambda.  The naive per-language form referenced the
    split-words subtree once per language and the score array three more
    times (scores/max/position); higher-order functions are
    CodegenFallback, so every reference re-evaluated interpreted —
    ~15 re-splits of the text per call (r5, measured).  Inside a lambda,
    ``acc``/``w`` are variables, so each subtree here evaluates once."""
    col = _as_col(col)
    langs = sorted(_STOPWORDS)
    n = len(langs)
    # constant-folded 2-D stopword literal: element_at(sw2d, i) = lang i's list
    sw2d = F.array(
        *[F.array(*[F.lit(s) for s in _STOPWORDS[lang]]) for lang in langs]
    )
    lang_lits = F.array(*[F.lit(lang) for lang in langs])
    words = F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")
    zeros = F.array_repeat(F.lit(0).cast("long"), n)

    def _step(acc: Column, w: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda i: F.element_at(acc, i)
            + F.array_contains(F.element_at(sw2d, i), w).cast("long"),
        )

    def _finish(acc: Column) -> Column:
        best = F.array_max(acc)
        return F.when(best <= 0, F.lit("und")).otherwise(
            F.element_at(lang_lits, F.array_position(acc, best).cast("int"))
        )

    picked = F.aggregate(words, zeros, _step, _finish)
    return F.when(col.isNull() | (col == ""), F.lit("und")).otherwise(picked)


def _word_explode(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) rows — whitespace words, empties dropped, duplicates
    kept (term frequency is the point)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        # small-scan guard (see dedup._banded): the explode + downstream
        # tf aggregation otherwise run on the scan's 1-4 splits
        df = df.repartition(parallelism)
    return df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("term"),
    )


def tf_idf_terms(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-(doc, term) TF-IDF: tf = raw in-document count,
    idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style).

    Plan shape: ONE explode pass → (id, term) groupBy with map-side
    combine for tf; document frequency derives from the tf aggregate
    itself (df(term) = number of tf rows for that term — far smaller
    than re-scanning the corpus), broadcast back onto the tf rows; N is
    a scalar via a 1-row broadcast cross join.  The tf aggregate is
    materialized (lazy localCheckpoint): Catalyst prunes the two
    consumers' columns differently, so their exchange subtrees never
    canonicalize equal and exchange reuse does NOT fire — without the
    materialization each branch would re-tokenize the whole corpus
    (verified in the adaptive final plan).  tf is the compacted
    intermediate (distinct (doc, term) pairs), far smaller than the
    corpus, so this is the standard materialize-the-compaction move.
    """
    words = _word_explode(df, id_col, text_col)
    tf = words.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1)
            ).alias("tf_idf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 of a fixed query, scored over matching documents.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
    with idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).  The query term list is a
    broadcast literal; the corpus is tokenized ONCE — document length,
    per-term tf, and document frequency all derive from the same
    materialized (id, term, tf) aggregate (see tf_idf_terms for why the
    materialization is load-bearing: per-branch column pruning defeats
    exchange reuse).

    Output contains ONE ROW PER DOCUMENT THAT MATCHES ≥1 QUERY TERM —
    documents containing none of the terms (or with empty text) produce
    no row rather than a 0.0 score (ADVICE r3).  That is the posting-list
    shape a retrieval caller wants at scale (score rows ∝ matches, not
    corpus size); to densify, left-join the corpus ids against this
    result and ``coalesce(bm25, 0.0)``.
    """
    words = _word_explode(df, id_col, text_col)
    all_tf = words.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    doclen = all_tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = all_tf.where(F.col("term").isin(query_terms))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1 - b + b * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * (k1 + 1) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(term_score).alias("bm25"))
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column family — one narrow projection."""
    col = F.col(text_col)
    return df.select(
        "*",
        whitespace_token_count(col).alias("n_tokens_ws"),
        bpe_ish_token_count(col).alias("n_tokens_bpe"),
        punct_ratio(col).alias("punct_ratio"),
        stopword_ratio(col).alias("stopword_ratio"),
        quality_score(col).alias("quality"),
        content_fingerprint(col).alias("fingerprint"),
        lang_id_col(col).alias("lang_pred"),
    )
