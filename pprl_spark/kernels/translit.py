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


# Script-level romanization for major non-Latin scripts (ADVICE r1: web
# text in Cyrillic/Greek must transliterate, not silently erase — an
# all-Cyrillic value would otherwise normalize to the empty string and
# trip the encoder's empty-token guard).  Standard GOST/ISO-adjacent
# romanizations, matching unidecode's published tables for the common
# codepoints; multi-char outputs (Zh, Shch, th, ps, …) follow unidecode's
# casing convention.  Accented Greek decomposes via NFKD first and then
# hits these base letters.
_CYRILLIC = {
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E", "Ё": "Io",
    "Ж": "Zh", "З": "Z", "И": "I", "Й": "I", "К": "K", "Л": "L", "М": "M",
    "Н": "N", "О": "O", "П": "P", "Р": "R", "С": "S", "Т": "T", "У": "U",
    "Ф": "F", "Х": "Kh", "Ц": "Ts", "Ч": "Ch", "Ш": "Sh", "Щ": "Shch",
    "Ъ": "'", "Ы": "Y", "Ь": "'", "Э": "E", "Ю": "Iu", "Я": "Ia",
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "io",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "'", "ы": "y", "ь": "'", "э": "e", "ю": "iu", "я": "ia",
    # Ukrainian / Belarusian extensions
    "Є": "Ie", "є": "ie", "І": "I", "і": "i", "Ї": "Yi", "ї": "yi",
    "Ґ": "G", "ґ": "g", "Ў": "U", "ў": "u",
}
_GREEK = {
    "Α": "A", "Β": "B", "Γ": "G", "Δ": "D", "Ε": "E", "Ζ": "Z", "Η": "E",
    "Θ": "Th", "Ι": "I", "Κ": "K", "Λ": "L", "Μ": "M", "Ν": "N", "Ξ": "X",
    "Ο": "O", "Π": "P", "Ρ": "R", "Σ": "S", "Τ": "T", "Υ": "U", "Φ": "Ph",
    "Χ": "Kh", "Ψ": "Ps", "Ω": "O",
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "e",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "u",
    "φ": "ph", "χ": "kh", "ψ": "ps", "ω": "o",
}
_SPECIALS.update(_CYRILLIC)
_SPECIALS.update(_GREEK)


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
