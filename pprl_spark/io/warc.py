"""WARC source — ingest Common-Crawl-style web archives into the pages
table shape ``(url, warc_ts, html binary)`` the rest of the engine
consumes (BASELINE input_hint; downstream ``webtext.extract_text_col``
produces ``text``).

Beyond the reference surface (ul-mds/pprl reads entity CSVs only); this
is the step upstream of the Iceberg pages table.

Scale shape: one Spark task per WARC file via the ``binaryFile`` source
— exactly how production crawls parallelize (a Common-Crawl snapshot is
~64k files of ~1 GiB; file-level parallelism saturates any cluster and
needs no intra-file splitting).  Records are parsed by Content-Length
walking (never regex over the whole archive), and ``.warc.gz``'s
concatenated per-record gzip members (ISO 28500 annex D — what makes
the format seekable) are inflated in one ``gzip.decompress`` pass.
Memory is one decompressed archive per task (~a few GiB for a standard
~1 GiB file) — size executor memory accordingly; records are then
emitted in Arrow batches.

Caveats (documented, not silent): payloads with ``Transfer-Encoding:
chunked`` captures are passed through un-dechunked (rare in WARC —
crawlers store the decoded body); ``binaryFile`` caps single files at
``spark.sql.sources.binaryFile.maxLength`` (2 GiB default), fine for
standard ~1 GiB archive files.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "parse_warc_bytes"]

_SCHEMA = "url string, warc_ts timestamp, html binary"


def _inflate_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout).

    ``gzip.decompress`` walks concatenated members with one streaming
    reader — a hand-rolled ``decompressobj`` loop over ``unused_data``
    is QUADRATIC here (each member's leftover is a fresh copy of the
    whole remaining archive; measured 37 s → 4 s on a 2.5k-page file)."""
    import gzip

    return gzip.decompress(data)


def _http_body(payload: bytes) -> bytes:
    """Strip the captured HTTP response envelope when present."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def parse_warc_bytes(data: bytes, gz: bool) -> "list[tuple]":
    """(url, warc_ts, html) for every ``response`` record in one WARC
    file's bytes.  Content-Length walking per ISO 28500 §4: each record
    is headers, CRLF CRLF, exactly Content-Length payload bytes, CRLF
    CRLF."""
    if gz:
        data = _inflate_members(data)
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            # tolerate stray padding between records
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        length = int(headers.get("content-length", "0"))
        payload = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # trailing CRLF CRLF
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date")
        if not url or not ts_raw:
            continue
        ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        rows.append(
            (url, ts.astimezone(timezone.utc).replace(tzinfo=None),
             _http_body(payload))
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: ``path`` is a file/dir/glob of ``.warc``
    or ``.warc.gz`` files; returns ``(url, warc_ts, html)``."""
    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = parse_warc_bytes(
                    bytes(content), gz=str(fpath).endswith(".gz")
                )
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html"]
                )

    return files.select("path", "content").mapInPandas(_parse, schema=_SCHEMA)
