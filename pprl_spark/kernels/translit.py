"""ASCII transliteration (dependency-free stand-in for ``unidecode``).

The reference pipes strings through ``unidecode`` in ``normalize()``
(/root/reference/packages/pprl_core/pprl_core/transform.py:34) and in the
phonetic coders (/root/reference/packages/pprl_core/pprl_core/
phonetics_extra.py:35,161).  ``unidecode`` is not available in this
environment, so this module provides an equivalent mapping built from

* an explicit table for the Latin-1 Supplement / Latin Extended-A specials
  whose transliteration is not derivable from Unicode decomposition
  (ß→ss, Æ→AE, Ø→O, Þ→Th, Đ→D, Ł→L, Œ→OE, ŋ→ng, …), matching unidecode's
  published tables for those codepoints, and
* NFKD decomposition with combining-mark removal for everything else
  (é→e, ü→u, Ä→A, …), which agrees with unidecode on all
  Latin letter+diacritic codepoints.

Characters that remain non-ASCII after both steps are dropped, matching
unidecode's behaviour of erasing unmapped codepoints.
"""

from __future__ import annotations

import unicodedata

__all__ = ["to_ascii"]

_SPECIALS = {
    "Æ": "AE", "æ": "ae",
    "Ð": "D", "ð": "d",
    "Ø": "O", "ø": "o",
    "Þ": "Th", "þ": "th",
    "ß": "ss", "ẞ": "SS",
    "Đ": "D", "đ": "d",
    "Ħ": "H", "ħ": "h",
    "ı": "i",
    "Ĳ": "IJ", "ĳ": "ij",
    "ĸ": "k",
    "Ŀ": "L", "ŀ": "l",
    "Ł": "L", "ł": "l",
    "ŉ": "'n",
    "Ŋ": "NG", "ŋ": "ng",
    "Œ": "OE", "œ": "oe",
    "Ŧ": "T", "ŧ": "t",
    "ſ": "s",
    "×": "x", "÷": "/",
    "‘": "'", "’": "'", "‚": ",",
    "“": '"', "”": '"', "„": '"',
    "–": "-", "—": "--", "‐": "-",
    "…": "...",
    " ": " ",
}


def _translit_char(ch: str) -> str:
    if ch.isascii():
        return ch
    mapped = _SPECIALS.get(ch)
    if mapped is not None:
        return mapped
    out = []
    for part in unicodedata.normalize("NFKD", ch):
        if unicodedata.combining(part):
            continue
        if part.isascii():
            out.append(part)
        elif part in _SPECIALS:
            out.append(_SPECIALS[part])
        # else: drop, like unidecode does for unmapped codepoints
    return "".join(out)


def to_ascii(text: str) -> str:
    """Transliterate a string to its closest ASCII representation."""
    if text.isascii():
        return text
    return "".join(_translit_char(ch) for ch in text)
