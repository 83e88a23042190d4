"""Ported goldens from reference packages/pprl_core/tests/test_harden.py."""

import random

import numpy as np
import pytest

from pprl_spark.kernels import harden


def bitstr(s: str) -> np.ndarray:
    return np.array([c == "1" for c in s], dtype=bool)


def test_balance():
    assert np.array_equal(harden.balance()(bitstr("1010")), bitstr("10100101"))


def test_xor_fold():
    out = harden.xor_fold()(bitstr("11111111" + "10100011"))
    assert np.array_equal(out, bitstr("11111111") ^ bitstr("10100011"))


def test_xor_fold_padded():
    out = harden.xor_fold()(bitstr("11111111" + "1010001"))
    assert np.array_equal(out, bitstr("11111111") ^ bitstr("10100010"))


def test_randomized_response(bits_factory):
    fn = harden.randomized_response(727, .5)
    ba = bits_factory()
    assert not np.array_equal(ba, fn(ba))


def test_randomized_response_same_seed(bits_factory):
    ba = bits_factory()
    out1 = harden.randomized_response(727, .5)(ba)
    out2 = harden.randomized_response(727, .5)(ba)
    assert np.array_equal(out1, out2)


def test_randomized_response_same_seed_different_probability(bits_factory):
    ba = bits_factory()
    out1 = harden.randomized_response(727, .5)(ba)
    out2 = harden.randomized_response(727, .25)(ba)
    assert not np.array_equal(out1, out2)


def test_randomized_response_matches_sequential_replay(bits_factory):
    # independent replay of the reference loop (harden.py:71-83)
    ba = bits_factory()
    rng = random.Random(99)
    expected = ba.copy()
    p = .5
    for i in range(len(expected)):
        d = rng.random()
        if d > p:
            continue
        expected[i] = d < p / 2
    assert np.array_equal(harden.randomized_response(99, p)(ba), expected)


def test_permute(bits_factory):
    ba = bits_factory()
    assert not np.array_equal(ba, harden.permute(727)(ba))


def test_permute_same_seed(bits_factory):
    ba = bits_factory()
    assert np.array_equal(harden.permute(727)(ba), harden.permute(727)(ba))


def test_permute_different_seed(bits_factory):
    ba = bits_factory()
    assert not np.array_equal(harden.permute(123)(ba), harden.permute(456)(ba))


def test_permute_matches_sequential_replay(bits_factory):
    # independent replay of the reference swap loop (harden.py:101-104)
    ba = bits_factory()
    vals = list(ba)
    rng = random.Random(31337)
    for i in range(len(vals) - 1, 0, -1):
        j = rng.randrange(i)
        vals[i], vals[j] = vals[j], vals[i]
    assert np.array_equal(harden.permute(31337)(ba), np.array(vals, dtype=bool))


@pytest.mark.parametrize(
    "original,expected",
    [("10010", "01100"), ("0110101", "0110000")],
)
def test_rule_90(original, expected):
    assert np.array_equal(harden.rule_90()(bitstr(original)), bitstr(expected))


def test_rehash(bits_factory):
    ba = bits_factory()
    assert not np.array_equal(ba, harden.rehash(8, 8, 3)(ba))


def test_rehash_parameter_sensitivity(bits_factory):
    ba = bits_factory()
    base = harden.rehash(8, 8, 3)(ba)
    assert not np.array_equal(base, harden.rehash(16, 8, 3)(ba))
    assert not np.array_equal(base, harden.rehash(8, 16, 3)(ba))
    assert not np.array_equal(base, harden.rehash(8, 8, 5)(ba))


def test_rehash_deterministic(bits_factory):
    ba = bits_factory()
    fn = harden.rehash(8, 8, 3)
    assert np.array_equal(fn(ba), fn(ba))


def test_rehash_matches_sequential_replay(bits_factory):
    # independent replay of the reference loop (harden.py:148-164)
    import struct

    ba = bits_factory()
    w, step, k = 12, 4, 3
    expected = ba.copy()
    n = len(ba)
    for i in range(0, n - w + 1, step):
        window = ba[i:i + w]
        packed = np.packbits(window).tobytes() + b"\x00" * 4
        rng = random.Random(struct.unpack_from("<i", packed)[0])
        for _ in range(k):
            expected[rng.randrange(n)] = True
    assert np.array_equal(harden.rehash(w, step, k)(ba), expected)


@pytest.mark.parametrize(
    "ba_size,window_size,window_step,expected_windows",
    [
        (16, 16, 16, [0]),
        (16, 8, 8, [0, 8]),
        (16, 16, 8, [0]),
        (16, 4, 2, [0, 2, 4, 6, 8, 10, 12]),
        (16, 32, 8, []),
        (16, 12, 4, [0, 4]),
    ],
)
def test_rehash_window_range(ba_size, window_size, window_step, expected_windows):
    assert list(range(0, ba_size - window_size + 1, window_step)) == expected_windows


def test_hardener_chain_order(bits_factory):
    from pprl_spark.config import HardenerConfig

    ba = bits_factory()
    chain = harden.build_hardener_chain(
        (HardenerConfig("balance"), HardenerConfig("xor_fold"))
    )
    expected = harden.xor_fold()(harden.balance()(ba))
    assert np.array_equal(chain(ba), expected)
