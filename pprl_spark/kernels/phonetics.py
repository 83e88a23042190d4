"""Phonetic coders (pure stdlib; no pyphonetics dependency).

Parity targets:

* ``ColognePhonetics`` and ``GenericSoundex`` — re-implemented from the
  semantics of /root/reference/packages/pprl_core/pprl_core/
  phonetics_extra.py:26-241 and validated against the reference's golden
  corpus (packages/pprl_core/tests/test_phonetics_extra.py:36-373).
* ``soundex`` / ``metaphone`` / ``refined_soundex`` / ``fuzzy_soundex`` —
  the reference delegates these to the public ``pyphonetics`` package
  (routers/transform.py:40-46); here they are implemented from the
  published algorithm descriptions (Philips 1990 for Metaphone, NARA
  rules for Soundex, Holmes & McCabe 2002 for Fuzzy Soundex).

All coders transliterate to ASCII first, mirroring the reference's use of
``unidecode``.
"""

from __future__ import annotations

import re

from .translit import to_ascii

__all__ = [
    "cologne",
    "RuleSoundex",
    "soundex",
    "metaphone",
    "refined_soundex",
    "fuzzy_soundex",
    "PHONETIC_CODERS",
]


def _prepare(word: str) -> str:
    if not isinstance(word, str):
        raise ValueError("word must be a string")
    if not word.strip():
        raise ValueError("word must not be empty")
    return to_ascii(word).upper()


# --------------------------------------------------------------------------
# Kölner Phonetik
# --------------------------------------------------------------------------

_COLOGNE_SIMPLE = {
    **dict.fromkeys("AEIJOUY", "0"),
    "B": "1",
    **dict.fromkeys("FVW", "3"),
    **dict.fromkeys("GKQ", "4"),
    "L": "5",
    **dict.fromkeys("MN", "6"),
    "R": "7",
    **dict.fromkeys("SZ", "8"),
}
_NON_ALPHA_RE = re.compile(r"[^A-Z]")


class _Cologne:
    """Kölner Phonetik; context rules per phonetics_extra.py:40-102."""

    def phonetics(self, word: str) -> str:
        word = _NON_ALPHA_RE.sub("", _prepare(word))
        raw: list[str] = []
        n = len(word)
        for i, ch in enumerate(word):
            prev = word[i - 1] if i > 0 else "#"
            nxt = word[i + 1] if i + 1 < n else "#"
            simple = _COLOGNE_SIMPLE.get(ch)
            if simple is not None:
                raw.append(simple)
            elif ch == "P":
                raw.append("3" if nxt == "H" else "1")
            elif ch in "DT":
                raw.append("8" if nxt in "CSZ" else "2")
            elif ch == "C":
                if i == 0:
                    raw.append("4" if nxt in "AHKLOQRUX" else "8")
                elif prev in "SZ":
                    raw.append("8")
                else:
                    raw.append("4" if nxt in "AHKOQUX" else "8")
            elif ch == "X":
                raw.append("8" if prev in "CKQ" else "48")
            # H and anything else: no code
        raw_code = "".join(raw)
        if not raw_code:
            return ""
        # collapse runs, then strip zeros everywhere but the leading position
        collapsed = raw_code[0]
        for ch in raw_code[1:]:
            if ch != collapsed[-1]:
                collapsed += ch
        return collapsed[0] + collapsed[1:].replace("0", "")


_cologne_singleton = _Cologne()


def cologne(word: str) -> str:
    return _cologne_singleton.phonetics(word)


# --------------------------------------------------------------------------
# Rule-table Soundex family (reference GenericSoundex semantics)
# --------------------------------------------------------------------------

class RuleSoundex:
    """Table-driven Soundex with configurable digit groups, ignore set and
    code length; semantics per reference phonetics_extra.py:105-241.

    ``ignore`` symbols are resolvable (coded "0") but are skipped entirely
    during scanning, so they neither emit a digit nor reset the
    previous-digit state (the classic H/W rule).
    """

    US_GROUPS = {
        0: "AEIOUYHW", 1: "BFPV", 2: "CGJKQSXZ", 3: "DT", 4: "L", 5: "MN", 6: "R",
    }

    def __init__(
        self,
        groups: dict[int, "str | list[str]"],
        ignore: "str | list[str]" = "",
        num_digits: int = 3,
    ):
        self._digit_of: dict[str, str] = {sym: "0" for sym in ignore}
        self._ignore = set(ignore)
        self._max_sym = 1
        for digit, symbols in groups.items():
            for sym in symbols:
                self._digit_of[sym.upper()] = str(digit)
                self._max_sym = max(self._max_sym, len(sym))
        self._num_digits = num_digits

    def _resolve(self, word: str, i: int) -> tuple[str | None, str]:
        """Longest-match symbol lookup at position ``i``."""
        for span in range(self._max_sym, 0, -1):
            sym = word[i : i + span]
            digit = self._digit_of.get(sym)
            if digit is not None:
                return digit, sym
        return None, word[i : i + 1]

    def phonetics(self, word: str) -> str:
        word = _prepare(word)
        # skip leading symbols with no code at all (punctuation etc.)
        i = 0
        while True:
            if i >= len(word):
                raise ValueError(f"word `{word}` contains no codable characters")
            first_digit, first_sym = self._resolve(word, i)
            if first_digit is not None:
                break
            i += max(len(first_sym), 1)

        code = first_sym
        last_digit = first_digit
        while i < len(word):
            digit, sym = self._resolve(word, i)
            i += max(len(sym), 1)
            if digit is None or sym in self._ignore:
                continue
            if digit != "0" and digit != last_digit:
                code += digit
            last_digit = digit

        code += "0" * self._num_digits
        return code[: self._num_digits + len(first_sym)]

    # ---- factory variants (reference phonetics_extra.py:108-155) ----

    @classmethod
    def us_english(cls, num_digits: int = 3) -> "RuleSoundex":
        return cls(cls.US_GROUPS, ignore="HW", num_digits=num_digits)

    @classmethod
    def us_english_simplified(cls, num_digits: int = 3) -> "RuleSoundex":
        return cls(cls.US_GROUPS, num_digits=num_digits)

    @classmethod
    def us_english_genealogy(cls, num_digits: int = 3) -> "RuleSoundex":
        return cls(cls.US_GROUPS, ignore="AEIOUYHW", num_digits=num_digits)

    @classmethod
    def german(cls, num_digits: int = 3) -> "RuleSoundex":
        return cls(
            {
                0: "AEIOUÄÖÜ", 1: "BPFV", 2: "CGKQXSZẞß", 3: "DT",
                4: "L", 5: "MN", 6: "R", 7: ["CH"],
            },
            ignore="WHYJ",
            num_digits=num_digits,
        )


_soundex_us = RuleSoundex.us_english()


def soundex(word: str) -> str:
    """Classic American Soundex (NARA rules, H/W-transparent)."""
    return _soundex_us.phonetics(word)


# --------------------------------------------------------------------------
# Refined Soundex
# --------------------------------------------------------------------------

_REFINED_MAP = {
    **dict.fromkeys("AEIOUYHW", "0"),
    **dict.fromkeys("BP", "1"),
    **dict.fromkeys("FV", "2"),
    **dict.fromkeys("CKS", "3"),
    **dict.fromkeys("GJ", "4"),
    **dict.fromkeys("QXZ", "5"),
    **dict.fromkeys("DT", "6"),
    "L": "7",
    **dict.fromkeys("MN", "8"),
    "R": "9",
}


def refined_soundex(word: str) -> str:
    """Refined Soundex: first letter + full-length dedup'd digit string
    (vowels coded 0 and retained, no truncation)."""
    word = _NON_ALPHA_RE.sub("", _prepare(word))
    if not word:
        raise ValueError("word contains no codable characters")
    digits: list[str] = []
    for ch in word:
        d = _REFINED_MAP.get(ch)
        if d is not None and (not digits or digits[-1] != d):
            digits.append(d)
    return word[0] + "".join(digits)


# --------------------------------------------------------------------------
# Fuzzy Soundex (Holmes & McCabe 2002)
# --------------------------------------------------------------------------

_FUZZY_MAP = {
    **dict.fromkeys("AEIOUYHW", "0"),
    **dict.fromkeys("BPFV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}

_FUZZY_PREFIX = [
    ("CS", "SS"), ("CZ", "SS"), ("TS", "SS"), ("TZ", "SS"),
    ("GN", "NN"), ("HR", "RR"), ("WR", "RR"), ("HW", "WW"),
    ("KN", "NN"), ("NG", "NN"),
    ("CHR", "KR"), ("PH", "FF"), ("PF", "FF"), ("MAC", "MK"), ("SCH", "SK"),
]

_FUZZY_ANY = [
    ("CA", "KA"), ("CC", "KK"), ("CK", "KK"), ("CE", "SE"), ("CHL", "KL"),
    ("CL", "KL"), ("CHR", "KR"), ("CR", "KR"), ("CI", "SI"), ("CO", "KO"),
    ("CU", "KU"), ("CY", "SY"), ("DG", "GG"), ("GH", "HH"), ("MAC", "MK"),
    ("MC", "MK"), ("NST", "NSS"), ("PF", "FF"), ("PH", "FF"), ("SCH", "SS"),
    ("TIO", "SIO"), ("TIA", "SIO"), ("TCH", "CHH"),
]

_FUZZY_SUFFIX = [("IX", "IC"), ("EX", "EC"), ("YE", "Y"), ("EE", "Y"), ("IE", "Y"),
                 ("DT", "T"), ("RT", "T"), ("RDT", "T"), ("NT", "T"), ("ND", "N")]


def fuzzy_soundex(word: str, num_digits: int = 4) -> str:
    """Fuzzy Soundex: q-gram substitution preprocessing + soundex-style
    digit coding with H/W transparency."""
    word = _NON_ALPHA_RE.sub("", _prepare(word))
    if not word:
        raise ValueError("word contains no codable characters")
    for pat, rep in _FUZZY_PREFIX:
        if word.startswith(pat):
            word = rep + word[len(pat):]
            break
    for pat, rep in _FUZZY_SUFFIX:
        if word.endswith(pat):
            word = word[: -len(pat)] + rep
            break
    for pat, rep in _FUZZY_ANY:
        word = word.replace(pat, rep)

    first = word[0]
    digits: list[str] = []
    last = _FUZZY_MAP.get(first, "0")
    for ch in word[1:]:
        d = _FUZZY_MAP.get(ch)
        if d is None or ch in "HW":
            continue
        if d != "0" and d != last:
            digits.append(d)
        last = d
    code = first + "".join(digits) + "0" * num_digits
    return code[: num_digits + 1]


# --------------------------------------------------------------------------
# Metaphone (Philips 1990)
# --------------------------------------------------------------------------

_VOWELS = "AEIOU"


def metaphone(word: str) -> str:  # noqa: C901 - rule table, inherently branchy
    """Original Metaphone."""
    w = _NON_ALPHA_RE.sub("", _prepare(word))
    if not w:
        raise ValueError("word contains no codable characters")

    # initial-letter exceptions
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[:1] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[2:]

    out: list[str] = []
    n = len(w)
    i = 0
    while i < n:
        ch = w[i]
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""

        # drop duplicate adjacent letters except C
        if ch == prev and ch != "C":
            i += 1
            continue

        if ch in _VOWELS:
            if i == 0:
                out.append(ch)
        elif ch == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif ch == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                out.append("K" if prev == "S" else "X")
            elif nxt in "IEY":
                if prev != "S":
                    out.append("S")
            else:
                out.append("K")
        elif ch == "D":
            if nxt == "G" and nxt2 in "EYI":
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif ch == "G":
            if nxt == "H":
                if i + 2 < n and w[i + 2] not in _VOWELS:
                    pass  # silent GH
                else:
                    out.append("K")
            elif nxt == "N":
                pass  # silent before N
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif ch == "H":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass
            elif prev in "CSPTG":
                pass
            else:
                out.append("H")
        elif ch in "FJLMNR":
            out.append(ch)
        elif ch == "K":
            if prev != "C":
                out.append("K")
        elif ch == "P":
            out.append("F" if nxt == "H" else "P")
        elif ch == "Q":
            out.append("K")
        elif ch == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("S")
        elif ch == "T":
            if nxt == "H":
                out.append("0")
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("T")
        elif ch == "V":
            out.append("F")
        elif ch == "W":
            if nxt in _VOWELS:
                out.append("W")
        elif ch == "X":
            out.append("KS")
        elif ch == "Y":
            if nxt in _VOWELS:
                out.append("Y")
        elif ch == "Z":
            out.append("S")
        i += 1

    return "".join(out)


class _FnCoder:
    def __init__(self, fn):
        self._fn = fn

    def phonetics(self, word: str) -> str:
        return self._fn(word)


#: Registry matching the service's algorithm names (routers/transform.py:40-46).
PHONETIC_CODERS = {
    "soundex": _FnCoder(soundex),
    "metaphone": _FnCoder(metaphone),
    "refined_soundex": _FnCoder(refined_soundex),
    "fuzzy_soundex": _FnCoder(fuzzy_soundex),
    "cologne": _cologne_singleton,
}
