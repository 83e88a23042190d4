"""Ported goldens from reference packages/pprl_core/tests/test_transform.py."""

import pytest

from pprl_spark.kernels import transform
from pprl_spark.kernels.phonetics import PHONETIC_CODERS, cologne


def test_character_filter_custom():
    assert transform.character_filter("o")("foobar") == "fbar"


def test_character_filter_default_strips_punctuation():
    assert transform.character_filter()("O'Brien-Smith!") == "OBrienSmith"


def test_normalize():
    assert transform.normalize()(" Fòo   bár ") == "foo bar"


def test_normalize_umlauts_and_sharp_s():
    fn = transform.normalize()
    assert fn("Müller") == "muller"
    assert fn("STRASSE  und  Straße") == "strasse und strasse"
    assert fn("björk \t façade") == "bjork facade"


def test_date_time():
    assert transform.date_time("%d.%m.%Y", "%Y-%m-%d")("29.06.1998") == "1998-06-29"


def test_number_six_digits():
    fn = transform.number(6)
    assert fn("2") == "2.000000"
    assert fn("2.11") == "2.110000"
    assert fn("2.5000001") == "2.500000"
    assert fn("-2.5000001") == "-2.500000"


def test_number_zero_digits():
    fn = transform.number(0)
    assert fn("2") == "2"
    assert fn("2.11") == "2"
    assert fn("-2.11") == "-2"


def test_phonetic_code_soundex():
    fn = transform.phonetic_code(PHONETIC_CODERS["soundex"])
    assert fn("foobar") == "F160"


def test_phonetic_code_cologne():
    assert cologne("Müller-Ludenscheidt") == "65752682"


def test_mapping_no_default():
    fn = transform.mapping({"male": "m", "female": "f"})
    assert fn("male") == "m"
    assert fn("female") == "f"
    with pytest.raises(ValueError) as e:
        fn("foobar")
    assert str(e.value) == "value `foobar` has no mapping, or no default value is present"


def test_mapping_with_default():
    fn = transform.mapping({"male": "m", "female": "f"}, default_val="x")
    assert fn("foobar") == "x"


def test_mapping_inline():
    # b's introduced by a replacement must not be replaced again
    fn = transform.mapping({"o": "b", "b": "a"}, inline=True)
    assert fn("foobar") == "fbbaar"


def test_mapping_inline_collision():
    fn = transform.mapping({"ob": "x", "ba": "y"}, inline=True)
    with pytest.raises(ValueError) as e:
        fn("foobar")
    assert str(e.value) == (
        "cannot resolve inline mapping: replacement of `ba` with `y` at index 3 overlaps"
    )


def test_mapping_inline_no_match_returns_input():
    assert transform.mapping({"zz": "q"}, inline=True)("foobar") == "foobar"
