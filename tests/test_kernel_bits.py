"""Ported goldens from reference packages/pprl_core/tests/test_bits.py and
test_common.py, run against the numpy kernels."""

import numpy as np
import pytest

from pprl_spark.kernels import bits
from pprl_spark.kernels.hashing import destructure_digest
from pprl_spark.kernels.tokenize import tokenize, tokenize_checked


@pytest.mark.parametrize("p,n,expected", [(.5, 5, 8), (.75, 5, 18), (.5, 20, 30)])
def test_optimal_size(p, n, expected):
    assert bits.optimal_size(p, n) == expected


def test_optimal_size_raises_p_too_low():
    with pytest.raises(ValueError) as e:
        bits.optimal_size(-.01, 20)
    assert str(e.value) == "percentage of set bits must be in range of [0,1), is -0.01"


def test_optimal_size_raises_p_too_high():
    with pytest.raises(ValueError) as e:
        bits.optimal_size(1, 20)
    assert str(e.value) == "percentage of set bits must be in range of [0,1), is 1"


def test_optimal_size_raises_n_too_low():
    with pytest.raises(ValueError) as e:
        bits.optimal_size(.5, 0)
    assert str(e.value) == "amount of expected insertions must be positive, is 0"


def test_set_bit():
    ba = bits.new_bits(20)
    bits.set_bits(ba, 5)
    assert ba.sum() == 1 and ba[5]


def test_set_bit_wraparound():
    ba = bits.new_bits(20)
    bits.set_bits(ba, 25)
    assert ba.sum() == 1 and ba[5]


def test_set_bit_same_index():
    ba = bits.new_bits(20)
    bits.set_bits(ba, 5)
    bits.set_bits(ba, 25)
    assert ba.sum() == 1 and ba[5]


def test_set_bit_negative():
    ba1, ba2 = bits.new_bits(20), bits.new_bits(20)
    bits.set_bits(ba1, -1)
    bits.set_bits(ba2, ~-1)
    assert np.array_equal(ba1, ba2)


def test_test_bit_wraparound():
    ba = bits.new_bits(20)
    bits.set_bits(ba, 5)
    assert bits.test_bit(ba, 5) and bits.test_bit(ba, 25)


def test_double_hash():
    m, h1, h2, k = 20, 2, 3, 5
    ba = bits.new_bits(m)
    bits.set_bits(ba, bits.double_hash_indices(k, h1, h2))
    for i in [h1 + h2 * i for i in range(1, k + 1)]:
        assert bits.test_bit(ba, i)


def test_triple_hash():
    m, h1, h2, h3, k = 20, 2, 3, 5, 7
    ba = bits.new_bits(m)
    bits.set_bits(ba, bits.triple_hash_indices(k, h1, h2, h3))
    for i in [h1 + i * h2 + h3 * (i * (i - 1)) // 2 for i in range(1, k + 1)]:
        assert bits.test_bit(ba, i)


def test_enhanced_double_hash():
    m, h1, h2, k = 20, 2, 3, 5
    ba = bits.new_bits(m)
    bits.set_bits(ba, bits.enhanced_double_hash_indices(k, h1, h2))
    for i in [h1 + i * h2 + (i ** 3 - i) // 6 for i in range(1, k + 1)]:
        assert bits.test_bit(ba, i)


def test_random_hash(rng_factory):
    m, k = 20, 5
    ba = bits.new_bits(m)
    bits.set_bits(ba, bits.random_hash_indices(k, 727, m))
    r2 = rng_factory()
    for i in [r2.randrange(m) for _ in range(k)]:
        assert bits.test_bit(ba, i)


def test_negative_hash_value_folding():
    # parity with _compute_idx: negative values are ~-inverted before mod
    m = 20
    for i in (-1, -21, -12345678901, 12345678901):
        expected = (~i if i < 0 else i) % m
        assert bits.fold_indices(i, m) == expected


def test_base64_roundtrip(bits_factory):
    ba1 = bits_factory()
    ba2 = bits.from_base64(bits.to_base64(ba1))
    # round-trip pads to a byte boundary with zero bits, like bitarray.fill()
    padded = np.concatenate([ba1, np.zeros((-len(ba1)) % 8, dtype=bool)])
    assert np.array_equal(padded, ba2)


def test_base64_rejects_invalid():
    with pytest.raises(Exception):
        bits.from_base64("not@@base64!!")


def test_pack_is_msb_first():
    ba = np.array([1, 0, 1, 0, 0, 1, 0, 1], dtype=bool)
    assert bits.pack(ba) == bytes([0b10100101])


# ---- test_common.py ports ----

def test_tokenize_q2():
    assert tokenize("foobar", 2, "_") == {"_f", "fo", "oo", "ob", "ba", "ar", "r_"}


def test_tokenize_q3():
    assert tokenize("foobar", 3, "_") == {
        "__f", "_fo", "foo", "oob", "oba", "bar", "ar_", "r__",
    }


def test_tokenize_custom_padding():
    assert tokenize("foobar", 2, "#") == {"#f", "fo", "oo", "ob", "ba", "ar", "r#"}


def test_tokenize_no_padding():
    assert tokenize("foobar", 2, "") == {"fo", "oo", "ob", "ba", "ar"}


def test_tokenize_checked_raises_on_empty():
    with pytest.raises(ValueError, match="did not produce any tokens"):
        tokenize_checked("e1", "gender", "m", 2, "")


def test_destructure_digest():
    digest = b"\x01" * 4 + b"\x23" * 4 + b"\x45" * 4 + b"\x67" * 4
    assert destructure_digest(digest) == (0x01010101, 0x23232323, 0x45454545, 0x67676767)


def test_destructure_digest_signed():
    digest = b"\xff" * 16
    assert destructure_digest(digest) == (-1, -1, -1, -1)
