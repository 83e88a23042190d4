"""Round-4 regression tests: ADVICE r3 fixes + the fused sketch/exact
aggregation (VERDICT r3 #2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r3 (medium): streaming dedup key lanes must be independent
# ---------------------------------------------------------------------------

def test_streaming_dedup_key_lanes_match_batch(spark):
    """The streaming dedup's second key lane must be the batch
    exact_dedup construction — salt literal FIRST (`xxhash64(salt,
    content)`), not `xxhash64(content, salt)` which Spark folds as a pure
    function of the first lane (seeded by the running hash)."""
    df = spark.createDataFrame([("abc",), ("xyz",)], "text string")
    rows = df.select(
        F.xxhash64(F.lit(0x9E3779B9), F.col("text")).alias("lead_salt"),
        F.xxhash64(F.col("text"), F.lit(0x9E3779B9)).alias("trail_salt"),
        F.xxhash64(F.col("text")).alias("k1"),
        F.xxhash64(F.xxhash64(F.col("text"))).alias("nested"),
    ).collect()
    for r in rows:
        # trailing salt IS a function of k1 alone — this asserts the trap
        # is real on this Spark version (if it ever stops holding, the
        # comment in encode_stream.py should be revisited, not the code)
        assert r["lead_salt"] != r["trail_salt"]

    # the streaming source actually uses the leading-salt form
    import inspect

    from pprl_spark.streaming import encode_stream

    src = inspect.getsource(encode_stream.streaming_dedup_exact)
    assert "F.xxhash64(F.lit(0x9E3779B9), F.col(content_col))" in src


# ---------------------------------------------------------------------------
# ADVICE r3: hash_split / hash_sample NULL-key policy
# ---------------------------------------------------------------------------

def test_hash_split_null_key_gets_null_split(spark):
    from pprl_spark.spark.sampling import hash_split

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id int, k string"
    )
    out = hash_split(df, "k", [0.5, 0.5]).collect()
    by_id = {r["id"]: r["split"] for r in out}
    assert by_id[2] is None and by_id[4] is None
    assert by_id[1] is not None and by_id[3] is not None


def test_hash_sample_drops_null_keys(spark):
    from pprl_spark.spark.sampling import hash_sample

    df = spark.createDataFrame(
        [(i, None if i % 2 else str(i)) for i in range(100)], "id int, k string"
    )
    kept = hash_sample(df, "k", 1.0).collect()
    assert len(kept) == 50
    assert all(r["k"] is not None for r in kept)


# ---------------------------------------------------------------------------
# ADVICE r3: chunked pipeline stage must reject a user `chunk` column
# ---------------------------------------------------------------------------

def test_pipeline_rejects_chunk_column_collision(spark, tmp_path):
    from pprl_spark.spark.pipeline import Pipeline, Stage

    def make(spark_, inputs):
        return spark_.range(10).select(
            F.col("id"), F.lit(7).alias("chunk")
        )

    pipe = Pipeline(
        spark,
        str(tmp_path),
        [Stage("s1", make, inputs=(), split_by="id", num_chunks=2)],
    )
    with pytest.raises(ValueError, match="chunk"):
        pipe.run()


# ---------------------------------------------------------------------------
# ADVICE r3: match_files must reject pairwise + lsh
# ---------------------------------------------------------------------------

def test_match_files_rejects_pairwise_with_lsh(spark):
    from pprl_spark.config import MatchConfig
    from pprl_spark.spark.lsh import LSHConfig
    from pprl_spark.spark.match import match_files

    df = spark.createDataFrame([("a", bytearray(b"\x01"))], "id string, bloom binary")
    with pytest.raises(ValueError, match="pairwise"):
        match_files(
            {"f1": df, "f2": df},
            MatchConfig("pairwise", 0.5),
            lsh=LSHConfig(8, 2, 4),
        )


# ---------------------------------------------------------------------------
# VERDICT r3 #2: fused sketch + exact distinct (one job)
# ---------------------------------------------------------------------------

def test_sketch_column_with_exact_matches_two_pass(spark):
    from pprl_spark.sketch import (HyperLogLog, sketch_column,
                                   sketch_column_with_exact)

    df = spark.range(10_000).select(
        (F.col("id") % 1337).cast("string").alias("k")
    )
    sk_fused, exact = sketch_column_with_exact(df, "k", lambda: HyperLogLog(p=12))
    assert exact == 1337
    sk_two_pass = sketch_column(df, "k", lambda: HyperLogLog(p=12))
    # same input stream → bit-identical merged sketch state
    assert sk_fused.estimate() == sk_two_pass.estimate()


def test_sketch_column_with_exact_partition_invariant(spark):
    from pprl_spark.sketch import HyperLogLog, sketch_column_with_exact

    base = spark.range(5_000).select((F.col("id") % 701).cast("string").alias("k"))
    results = []
    for p in (1, 2, 7, 32):
        sk, exact = sketch_column_with_exact(
            base.repartition(p), "k", lambda: HyperLogLog(p=12)
        )
        results.append((exact, sk.estimate()))
    assert all(r == results[0] for r in results)
    assert results[0][0] == 701


def test_sketch_column_with_exact_null_and_empty(spark):
    from pprl_spark.sketch import HyperLogLog, sketch_column_with_exact

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("a",)], "k string"
    )
    sk, exact = sketch_column_with_exact(df, "k", lambda: HyperLogLog(p=12))
    assert exact == 2
    empty = df.where(F.col("k") == "zzz")
    sk0, exact0 = sketch_column_with_exact(empty, "k", lambda: HyperLogLog(p=12))
    assert exact0 == 0
    assert sk0.estimate() == 0.0


# ---------------------------------------------------------------------------
# merged driver queries keep their per-variant semantics
# ---------------------------------------------------------------------------

def test_merged_queries_cover_variants(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    hard = E.pprl_mask_hardened(spark, sf)
    assert set(hard.columns) == {"id", "mask_hardened", "mask_rr", "mask_rehash"}
    weighted = E.pprl_mask_weighted(spark, sf)
    assert set(weighted.columns) == {"id", "mask_rbf", "mask_clkrbf"}
    ann = E.ann_topk(spark, sf)
    methods = {r["method"] for r in ann.select("method").distinct().collect()}
    assert methods == {"lsh", "ivf"}
    tr = E.transform_attributes(spark, sf)
    ops = {r["op"] for r in tr.select("op").distinct().collect()}
    assert ops == {"date_time", "number", "mapping"}
    qs = E.quantile_sketches(spark, sf)
    sketches = {r["sketch"] for r in qs.select("sketch").distinct().collect()}
    assert sketches == {"kll", "tdigest"}


def test_queries_fit_driver_window():
    """The driver's correctness file holds at most the first 50 queries()
    entries (CORRECTNESS_r03) — the registry must stay within that."""
    import __spark_entry__ as E

    q = E.queries()
    assert len(q) <= 50
    o = E.oracle_sql()
    assert set(o) <= set(q)


# ---------------------------------------------------------------------------
# VERDICT r3 #5: real GIF LZW raster decode
# ---------------------------------------------------------------------------

def _frame_subblocks(blocks: bytes) -> bytes:
    sub = bytearray()
    i = 0
    while blocks[i] != 0:
        ln = blocks[i]
        sub += blocks[i + 1 : i + 1 + ln]
        i += 1 + ln
    return bytes(sub)


def test_gif_lzw_roundtrip_including_table_full():
    import numpy as np

    from pprl_spark.fixtures import _gif_lzw_encode
    from pprl_spark.spark.multimodal import _gif_lzw_decode

    rng = np.random.RandomState(13)
    for n in (1, 2, 255, 4096, 60_000):
        data = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        assert _gif_lzw_decode(_frame_subblocks(_gif_lzw_encode(data, 8)), 8) == data
    runs = bytes([i % 5 for i in range(50_000)])  # long-chain / KwKwK path
    assert _gif_lzw_decode(_frame_subblocks(_gif_lzw_encode(runs, 8)), 8) == runs


def test_gif_lzw_decodes_uncompressed_variant():
    """Real-world encoders may emit all-literal streams with frequent
    clear codes so the code width never grows ('uncompressed GIF') — the
    decoder must accept that convention, not just our encoder's."""
    from pprl_spark.spark.multimodal import _gif_lzw_decode

    data = bytes(range(256)) * 4
    bits = []
    width = 9
    count = 0
    bits.append((256, width))  # initial clear
    for b in data:
        if count == 200:  # clear well before the table could force growth
            bits.append((256, width))
            count = 0
        bits.append((b, width))
        count += 1
    bits.append((257, width))  # EOI
    acc = n = 0
    stream = bytearray()
    for code, w in bits:
        acc |= code << n
        n += w
        while n >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        stream.append(acc & 0xFF)
    assert _gif_lzw_decode(bytes(stream), 8) == data


def test_gif_pattern_decode_matches_arithmetic():
    import numpy as np

    from pprl_spark.fixtures import make_patterned_gif_bytes
    from pprl_spark.spark.multimodal import decode_gif_pixels

    for doc_id in (0, 1, 7, 99, 250):
        w, h = 16 + doc_id % 17, 16 + (doc_id * 3) % 13
        px = decode_gif_pixels(make_patterned_gif_bytes(w, h, doc_id))
        expect = np.array(
            [[(doc_id + 7 * r + 3 * c) % 251 for c in range(w)] for r in range(h)],
            dtype=np.uint8,
        )[:, :, None]
        assert px.shape == (h, w, 1)
        assert np.array_equal(px, expect)


def test_gif_decode_skips_extensions_and_maps_rgb_palette():
    import struct

    import numpy as np

    from pprl_spark.fixtures import _gif_lzw_encode
    from pprl_spark.spark.multimodal import decode_gif_pixels

    w = h = 4
    screen = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    palette = bytes(
        v for i in range(256) for v in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)
    )
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    comment = b"\x21\xfe\x05hello\x00"
    indices = bytes((r * w + c) % 251 for r in range(h) for c in range(w))
    image = b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
    data = bytes([8]) + _gif_lzw_encode(indices, 8)
    gif = b"GIF89a" + screen + palette + gce + comment + image + data + b";"
    px = decode_gif_pixels(gif)
    assert px.shape == (h, w, 3)  # non-gray palette keeps 3 channels
    for r in range(h):
        for c in range(w):
            i = (r * w + c) % 251
            assert tuple(px[r, c]) == ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)


def test_gif_decode_rejects_unsupported():
    import struct

    import pytest as _pytest

    from pprl_spark.fixtures import make_patterned_gif_bytes
    from pprl_spark.spark.multimodal import decode_gif_pixels

    gif = bytearray(make_patterned_gif_bytes(16, 16, 3))
    # image descriptor sits right after header(13) + 256-entry palette;
    # flip the interlace bit in its flags byte (searching for b"," would
    # false-hit palette byte 0x2C = gray 44)
    idx = 13 + 256 * 3
    assert gif[idx] == 0x2C
    gif[idx + 9] |= 0x40
    with _pytest.raises(ValueError, match="interlaced"):
        decode_gif_pixels(bytes(gif))
    # GIF without a global palette
    screen = struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
    with _pytest.raises(ValueError, match="global color table"):
        decode_gif_pixels(b"GIF89a" + screen + b";")


def test_image_pixel_features_mixed_formats(spark):
    from pprl_spark.fixtures import make_pixel_payloads
    from pprl_spark.spark.multimodal import image_pixel_features

    docs = spark.range(20).selectExpr("id AS doc_id")
    payloads = make_pixel_payloads(docs, formats=("png", "gif"))
    rows = image_pixel_features(payloads, grid=4).collect()
    assert len(rows) == 20
    by_id = {r["doc_id"]: r for r in rows}
    for i in range(20):
        r = by_id[i]
        assert r["format"] == ("png" if i % 2 == 0 else "gif")
        # identical pattern → identical means across container formats
        expect_w, expect_h = 16 + i % 17, 16 + (i * 3) % 13
        assert (r["width"], r["height"]) == (expect_w, expect_h)
