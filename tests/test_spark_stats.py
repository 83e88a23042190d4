"""Weight-estimation stats vs straightforward local computation, plus the
reference's invariants (test_lib.py:162-199: padding must NOT change the
entropy weight, token size MUST)."""

import math
from collections import Counter

import pytest

from pprl_spark.kernels.tokenize import tokenize
from pprl_spark.spark.stats import (
    average_token_count,
    compute_attribute_stats,
    ngram_entropy,
    token_frequencies,
)

WORDS = ["foobar", "foobaz", "barbaz", "quux", "foofoo", "bazbar", "barbar", "quuz"]


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], ["value"])


def _local_counts(q, padding):
    counts = Counter()
    for w in WORDS:
        counts.update(tokenize(w, q, padding))
    return counts


def test_padded_qgram_tokens_expression_matches_kernel(spark):
    """The Catalyst tokenizer expression must produce the same distinct
    gram set as kernels.tokenize for every (q, padding) shape, including
    the short-value/empty-padding edge where the reference returns the
    empty set."""
    from pyspark.sql import functions as F

    from pprl_spark.spark.stats import padded_qgram_tokens

    values = ["foobar", "a", "", "ab", "hello world"]
    df = spark.createDataFrame([(v,) for v in values], ["value"])
    for q, padding in ((2, "_"), (3, "_"), (4, "#"), (2, ""), (4, "")):
        rows = df.select(
            "value", padded_qgram_tokens(F.col("value"), q, padding).alias("t")
        ).collect()
        for r in rows:
            assert set(r["t"]) == tokenize(r["value"], q, padding), (q, padding, r["value"])


def test_documents_corpus_is_ascii(spark):
    """The multimodal_frames oracle hashes character substrings in DuckDB
    against byte slices in the engine — valid only while the corpus is
    pure ASCII.  Guard the assumption."""
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001",):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        bad = docs.filter(
            F.length(F.col("text")) != F.octet_length(F.col("text"))
        ).count()
        assert bad == 0


def test_token_frequencies_exact(words_df):
    got = {r["token"]: r["freq"] for r in token_frequencies(words_df, "value").collect()}
    assert got == dict(_local_counts(2, "_"))


def test_average_token_count(words_df):
    expected = sum(len(tokenize(w, 2, "_")) for w in WORDS) / len(WORDS)
    assert average_token_count(words_df, "value") == pytest.approx(expected)


def test_ngram_entropy_matches_local(words_df):
    counts = _local_counts(2, "_")
    n = sum(counts.values())
    expected = -sum((c / n) * math.log2(c / n) for c in counts.values())
    assert ngram_entropy(words_df, "value") == pytest.approx(expected)


def test_padding_does_not_change_weight_token_size_does(words_df):
    """Reference test_lib.py:162-199 invariants."""
    w_pad_underscore = ngram_entropy(words_df, "value", q=2, padding="_")
    w_pad_hash = ngram_entropy(words_df, "value", q=2, padding="#")
    w_q3 = ngram_entropy(words_df, "value", q=3, padding="_")
    assert w_pad_underscore == pytest.approx(w_pad_hash)
    assert w_q3 != pytest.approx(w_pad_underscore)


def test_compute_attribute_stats(spark):
    df = spark.createDataFrame(
        [("anna", "1990-01-01"), ("berta", "1991-02-02"), ("carla", "1992-03-03")],
        ["name", "dob"],
    )
    stats = compute_attribute_stats(df, ["name", "dob"])
    assert [s.attribute_name for s in stats] == ["name", "dob"]
    for s in stats:
        assert s.weight > 0 and s.average_token_count > 0
