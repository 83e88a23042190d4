"""Ported goldens from reference packages/pprl_core/tests/test_similarity.py."""

import numpy as np
import pytest

from pprl_spark.kernels import bits, similarity


@pytest.fixture()
def vec_pair():
    a = bits.pack(np.ones(40, dtype=bool))
    b = bits.pack(np.concatenate([np.ones(10, dtype=bool), np.zeros(30, dtype=bool)]))
    return a, b


def test_dice(vec_pair):
    a, b = vec_pair
    assert similarity.pair_similarity("dice", [a], [b])[0] == pytest.approx(0.4)


def test_cosine(vec_pair):
    a, b = vec_pair
    assert similarity.pair_similarity("cosine", [a], [b])[0] == pytest.approx(0.5)


def test_jaccard(vec_pair):
    a, b = vec_pair
    assert similarity.pair_similarity("jaccard", [a], [b])[0] == pytest.approx(0.25)


def test_batched_pairs_match_scalar(bits_factory):
    rows_a = [bits.pack(bits_factory()) for _ in range(16)]
    rows_b = [bits.pack(bits_factory()) for _ in range(16)]
    batched = similarity.pair_similarity("dice", rows_a, rows_b)
    for i, (a, b) in enumerate(zip(rows_a, rows_b)):
        one = similarity.pair_similarity("dice", [a], [b])[0]
        assert batched[i] == pytest.approx(one)


def test_similarity_matrix_shape_and_values(bits_factory):
    dom = [bits.pack(bits_factory()) for _ in range(3)]
    rng_side = [bits.pack(bits_factory()) for _ in range(5)]
    mat = similarity.similarity_matrix("jaccard", dom, rng_side)
    assert mat.shape == (3, 5)
    assert mat[1, 2] == pytest.approx(
        similarity.pair_similarity("jaccard", [dom[1]], [rng_side[2]])[0]
    )


def test_identical_vectors_similarity_one(bits_factory):
    v = bits.pack(bits_factory())
    for measure in ("dice", "cosine", "jaccard"):
        assert similarity.pair_similarity(measure, [v], [v])[0] == pytest.approx(1.0)


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="equal length"):
        similarity.pair_similarity("dice", [b"\xff\xff"], [b"\xff"])


def test_unknown_measure_raises():
    with pytest.raises(ValueError, match="unimplemented similarity measure"):
        similarity.pair_similarity("hamming", [b"\xff"], [b"\xff"])
