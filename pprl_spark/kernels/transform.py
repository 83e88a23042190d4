"""Scalar string transforms (the "projection" layer).

Parity: /root/reference/packages/pprl_core/pprl_core/transform.py.  Every
transform is a ``str -> str`` function produced by a factory; chains are
composed per attribute by :mod:`pprl_spark.spark.transform`.

Notable reproduced quirks:

* ``normalize`` keeps the reference's regex ``[^\\x00-\\x7f]]`` verbatim
  (transform.py:38) — the stray ``]`` makes it match a non-ASCII char
  *followed by* a literal ``]``, which is effectively dead code after
  transliteration.  Behaviour, not intent, is reproduced.
* ``mapping(..., inline=True)`` performs *simultaneous* non-overlapping
  substring replacement; overlapping replacements raise with the same
  message (transform.py:96-144).  This is deliberately not chained
  ``str.replace``: replacements must not see each other's output.
"""

from __future__ import annotations

import re
import string as _string
from datetime import datetime
from typing import Callable

from .translit import to_ascii

__all__ = [
    "StringTransformFn",
    "character_filter",
    "normalize",
    "number",
    "date_time",
    "phonetic_code",
    "mapping",
    "DEFAULT_FILTER_CHARACTERS",
]

StringTransformFn = Callable[[str], str]

# Service default for character_filter (routers/transform.py:20-21).
DEFAULT_FILTER_CHARACTERS = _string.punctuation

_DEAD_NONASCII_RE = re.compile(r"[^\x00-\x7f]]")
_MULTI_WS_RE = re.compile(r"\s{2,}")


def character_filter(chars: str = DEFAULT_FILTER_CHARACTERS) -> StringTransformFn:
    """Drop every character contained in ``chars`` (transform.py:24-28)."""
    drop = set(chars)

    def _apply(value: str) -> str:
        return "".join(c for c in value if c not in drop)

    return _apply


def normalize() -> StringTransformFn:
    """ASCII-fold, NFKD, lowercase, collapse whitespace, strip
    (transform.py:31-46).  This is the byte-identical per-url text
    extractor invariant from BASELINE.json ``input_hint``."""
    import unicodedata

    def _apply(value: str) -> str:
        value = to_ascii(value)
        value = unicodedata.normalize("NFKD", value)
        value = _DEAD_NONASCII_RE.sub("", value)
        value = value.lower()
        value = _MULTI_WS_RE.sub(" ", value)
        return value.strip()

    return _apply


def number(decimal_places: int) -> StringTransformFn:
    """Parse as float, re-format with fixed decimals (transform.py:49-55)."""
    fmt = f"{{:0.{decimal_places}f}}"

    def _apply(value: str) -> str:
        return fmt.format(float(value))

    return _apply


def date_time(input_format: str, output_format: str) -> StringTransformFn:
    """strptime → strftime reformat (transform.py:58-62)."""

    def _apply(value: str) -> str:
        return datetime.strptime(value, input_format).strftime(output_format)

    return _apply


def phonetic_code(coder) -> StringTransformFn:
    """Wrap a phonetic coder object exposing ``phonetics(word)``
    (transform.py:65-69); see :mod:`pprl_spark.kernels.phonetics`."""

    def _apply(value: str) -> str:
        return coder.phonetics(value)

    return _apply


def mapping(
    char_dict: dict[str, str],
    default_val: str | None = None,
    inline: bool = False,
) -> StringTransformFn:
    """Whole-value dict lookup, or simultaneous inline substring replacement
    (transform.py:83-146)."""

    if not inline:
        def _apply_lookup(value: str) -> str:
            out = char_dict.get(value, default_val)
            if out is None:
                raise ValueError(
                    f"value `{value}` has no mapping, or no default value is present"
                )
            return out

        return _apply_lookup

    def _apply_inline(value: str) -> str:
        # (start index, source, target) for every match, collected over all
        # mapping entries; an index claimed twice is an overlap error.
        claimed = bytearray(len(value))
        found: list[tuple[int, str, str]] = []

        for source, target in char_dict.items():
            span = len(source)
            pos = value.find(source, 0)
            while pos != -1:
                if any(claimed[pos : pos + span]):
                    raise ValueError(
                        f"cannot resolve inline mapping: replacement of `{source}` with "
                        f"`{target}` at index {pos} overlaps"
                    )
                found.append((pos, source, target))
                for j in range(pos, pos + span):
                    claimed[j] = 1
                pos = value.find(source, pos + 1)

        if not found:
            return value

        found.sort(key=lambda item: item[0])
        pieces: list[str] = []
        cursor = 0
        for pos, source, target in found:
            pieces.append(value[cursor:pos])
            pieces.append(target)
            cursor = pos + len(source)
        pieces.append(value[cursor:])
        return "".join(pieces)

    return _apply_inline
