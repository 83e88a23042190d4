"""Deterministic synthetic data (FIXTURES.md) — no external data, no faker.

``make_pages`` synthesizes the BASELINE.json ``input_hint`` table
``pages(url, warc_ts, html, text, lang)`` at any scale, distributed: the
generator is a pure function of the row index ``i``, applied with
``mapInPandas`` over ``spark.range(n)``, so any partitioning yields the
same table and the build parallelizes across executors (the property that
lets the same code synthesize 10^12 rows on a cluster).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["VOCAB", "page_row", "make_pages", "make_pages_local"]

_ACCENTED = ["müller", "björk", "façade", "jürgen", "zoë", "garçon", "über", "señor"]


def _build_vocab() -> list[str]:
    """Fixed 512-word vocabulary: deterministic ASCII word salad plus a few
    accented words to exercise normalize() (FIXTURES.md F1)."""
    rng = random.Random(512)
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    words: list[str] = list(_ACCENTED)
    seen = set(words)
    while len(words) < 512:
        n_syll = rng.randint(1, 4)
        word = "".join(
            rng.choice(consonants) + rng.choice(vowels) for _ in range(n_syll)
        )
        if word not in seen:
            seen.add(word)
            words.append(word)
    return words


VOCAB = _build_vocab()

_LANGS = ["en", "de", "fr", "es", "pt", "it", "nl", "sv"]
_EPOCH = datetime(2024, 1, 1)


def _text_for(i: int) -> str:
    rng = random.Random(727 + i)
    n_words = rng.randint(5, 50)
    return " ".join(rng.choice(VOCAB) for _ in range(n_words))


def page_row(i: int) -> dict:
    """Row ``i`` of the pages table — pure function of ``i`` (seed 727)."""
    if i % 101 == 0 and i > 0:
        # near-duplicate: previous row's text with one word swapped
        words = _text_for(i - 1).split(" ")
        words[len(words) // 2] = VOCAB[i % len(VOCAB)]
        text = " ".join(words)
    else:
        text = _text_for(i)
    lang = "en" if i % 5 < 3 else _LANGS[i % 8]
    return {
        "url": f"https://site-{i % 997:03d}.example/{i:012d}",
        "warc_ts": _EPOCH + timedelta(seconds=37 * i),
        "html": f"<html><body>{text}</body></html>".encode(),
        "text": text,
        "lang": lang,
    }


_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def make_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed synthesis of ``n`` pages."""
    base = spark.range(0, n, numPartitions=partitions)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([page_row(int(i)) for i in pdf["id"]])

    return base.mapInPandas(_gen, schema=_SCHEMA)


def make_pages_local(n: int) -> list[dict]:
    return [page_row(i) for i in range(n)]
