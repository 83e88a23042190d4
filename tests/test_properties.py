"""Property-based tests (hypothesis) for the pure kernel + sketch layers.

These complement the reference-golden tests: goldens pin exact reference
parity on known vectors; properties pin the algebraic invariants (length
laws, involutions, merge associativity, order insensitivity) over
generated inputs.  Examples are bounded small so the whole module stays
fast and deterministic (derandomized profile).
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FAST = settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

bits_arrays = st.lists(st.booleans(), min_size=1, max_size=96).map(
    lambda xs: np.array(xs, dtype=bool)
)


# ------------------------------------------------------------ hardeners

@FAST
@given(bits_arrays)
def test_balance_always_half_set(bits):
    from pprl_spark.kernels.harden import balance

    out = balance()(bits)
    assert out.shape[0] == 2 * bits.shape[0]
    assert int(out.sum()) == bits.shape[0]  # exactly 50% set


@FAST
@given(bits_arrays)
def test_xor_fold_halves_length(bits):
    from pprl_spark.kernels.harden import xor_fold

    out = xor_fold()(bits)
    assert out.shape[0] == (bits.shape[0] + 1) // 2


@FAST
@given(bits_arrays, st.integers(0, 2**31 - 1))
def test_permute_is_popcount_preserving_bijection(bits, seed):
    from pprl_spark.kernels.harden import permute

    out = permute(seed)(bits)
    assert out.shape[0] == bits.shape[0]
    assert int(out.sum()) == int(bits.sum())


@FAST
@given(bits_arrays)
def test_rule_90_is_length_preserving_and_linear(bits):
    from pprl_spark.kernels.harden import rule_90

    fn = rule_90()
    assert fn(bits).shape[0] == bits.shape[0]
    other = ~bits
    # GF(2) linearity: f(a ^ b) == f(a) ^ f(b)
    assert np.array_equal(fn(bits ^ other), fn(bits) ^ fn(other))


@FAST
@given(bits_arrays, st.integers(2, 16), st.integers(1, 8), st.integers(1, 4))
def test_rehash_only_sets_bits(bits, window, step, k):
    from pprl_spark.kernels.harden import rehash

    if window > bits.shape[0]:
        window = bits.shape[0]
    out = rehash(window, step, k)(bits)
    # rehash is monotone: never clears a bit
    assert not np.any(bits & ~out)


# ------------------------------------------------------------- similarity

@FAST
@given(st.lists(st.integers(0, 255), min_size=4, max_size=16))
def test_similarity_symmetric_and_self_unit(byte_list):
    from pprl_spark.kernels.similarity import pair_similarity

    a = bytes(byte_list)
    b = bytes(reversed(byte_list))
    for m in ("dice", "cosine", "jaccard"):
        ab = float(pair_similarity(m, [a], [b])[0])
        ba = float(pair_similarity(m, [b], [a])[0])
        assert ab == ba
        assert 0.0 <= ab <= 1.0
        if any(byte_list):
            assert float(pair_similarity(m, [a], [a])[0]) == 1.0


# --------------------------------------------------------------- sketches

hash_lists = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=400
)


@FAST
@given(hash_lists, st.integers(1, 5))
def test_hll_merge_matches_single_pass(hashes, n_splits):
    from pprl_spark.sketch import HyperLogLog

    full = HyperLogLog(p=8)
    full.update(np.array(hashes, dtype=np.int64))
    acc = HyperLogLog(p=8)
    for part in np.array_split(np.array(hashes, dtype=np.int64), n_splits):
        s = HyperLogLog(p=8)
        s.update(part)
        acc.merge(s)
    assert acc.serialize() == full.serialize()


@FAST
@given(hash_lists, st.integers(1, 5))
def test_theta_merge_matches_single_pass(hashes, n_splits):
    from pprl_spark.sketch import ThetaSketch

    full = ThetaSketch(k=16)
    full.update(np.array(hashes, dtype=np.int64))
    acc = ThetaSketch(k=16)
    for part in np.array_split(np.array(hashes, dtype=np.int64), n_splits):
        s = ThetaSketch(k=16)
        s.update(part)
        acc.merge(s)
    assert acc.serialize() == full.serialize()
    # update order must not matter either
    rev = ThetaSketch(k=16)
    rev.update(np.array(list(reversed(hashes)), dtype=np.int64))
    assert rev.serialize() == full.serialize()


@FAST
@given(hash_lists)
def test_theta_estimate_exact_below_k(hashes):
    from pprl_spark.sketch import ThetaSketch

    distinct = len(set(np.array(hashes, dtype=np.int64).view(np.uint64).tolist()))
    sk = ThetaSketch(k=1024)
    sk.update(np.array(hashes, dtype=np.int64))
    assert sk.estimate() == float(distinct)


@FAST
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32), min_size=1, max_size=300))
def test_kll_quantiles_within_rank_bound(values):
    from pprl_spark.sketch import KLLSketch

    sk = KLLSketch(k=128)
    sk.update(np.array(values, dtype=np.float64))
    ordered = np.sort(np.array(values, dtype=np.float64))
    n = len(ordered)
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        # the estimate's rank RANGE (ties span a range) must cover q
        # within epsilon
        lo = np.searchsorted(ordered, est, side="left") / n
        hi = np.searchsorted(ordered, est, side="right") / n
        assert lo - sk.epsilon - 1.0 / n <= q <= hi + sk.epsilon + 1.0 / n


# ------------------------------------------------------------ bit packing

@FAST
@given(bits_arrays)
def test_pack_unpack_roundtrip(bits):
    from pprl_spark.kernels.bits import from_base64, to_base64

    b64 = to_base64(bits)
    back = from_base64(b64, bits.shape[0])
    assert np.array_equal(back, bits)


# ------------------------------------------------------ raster codecs (r4)

@FAST
@given(st.binary(min_size=0, max_size=4000))
def test_gif_lzw_roundtrip_property(data):
    from pprl_spark.fixtures import _gif_lzw_encode
    from pprl_spark.spark.multimodal import _gif_lzw_decode

    blocks = _gif_lzw_encode(data, 8)
    sub = bytearray()
    i = 0
    while blocks[i] != 0:
        ln = blocks[i]
        sub += blocks[i + 1 : i + 1 + ln]
        i += 1 + ln
    assert _gif_lzw_decode(bytes(sub), 8) == data


@FAST
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_quantized_roundtrip_property(bw, bh, seed):
    """Arbitrary sparse quantized blocks survive Huffman encode →
    decode → IDCT identically to the reference IDCT of the same
    coefficients (pins bitstream, categories, DC prediction, zigzag)."""
    import numpy as np

    from pprl_spark.fixtures import make_jpeg_from_quantized
    from pprl_spark.spark.multimodal import _idct_matrix, decode_jpeg_pixels

    rng = np.random.RandomState(seed % 2**32)
    w, h = bw * 8, bh * 8
    blocks = []
    for _ in range(bw * bh):
        blk = np.zeros(64, dtype=int)
        blk[0] = int(rng.randint(-1000, 1000))
        for _ in range(int(rng.randint(0, 8))):
            blk[rng.randint(1, 64)] = int(rng.randint(-1023, 1023))
        blocks.append(blk.tolist())
    px = decode_jpeg_pixels(make_jpeg_from_quantized(w, h, blocks))
    a = _idct_matrix()
    expect = np.zeros((h, w))
    for i, blk in enumerate(blocks):
        bR, bC = divmod(i, bw)
        S = np.array(blk, dtype=float).reshape(8, 8)
        expect[bR * 8 : bR * 8 + 8, bC * 8 : bC * 8 + 8] = a.T @ S @ a
    expect = np.clip(np.round(expect + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(px[:, :, 0], expect)


@FAST
@given(st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=500))
def test_shard_packing_reference_property(tokens, budget):
    """Pure-python check of the packing rule used by assign_shards:
    exclusive cumsum // budget is non-decreasing and respects the
    budget up to one-document overflow."""
    cum = 0
    prev = 0
    totals = {}
    for t in tokens:
        s = cum // budget
        assert s >= prev
        prev = s
        totals[s] = totals.get(s, 0) + t
        cum += t
    for s, tot in totals.items():
        if s != max(totals):
            assert tot + max(tokens) >= budget
