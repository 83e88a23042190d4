"""Reference generator-config parity for the estimate flow.

The reference ``pprl estimate gecko|faker CONFIG.json OUT.json`` commands
(pprl_client cli.py:428-563) read a generator config —
``{seed, count, [locale], generators: [{function_name, attribute_name(s),
args}]}`` (pprl_client model.py) — synthesize ``count`` records with the
Gecko/Faker libraries, and estimate per-attribute weights.  Neither
library is installable here (and a cluster job shouldn't depend on a
single-process generator anyway), so this module maps the SAME config
files to deterministic pure-function generators ``row index -> str`` that
:func:`pprl_spark.spark.stats.estimate_weights` distributes over
``spark.range(count)``:

* **Gecko frequency tables** (``from_frequency_table`` /
  ``from_multicolumn_frequency_table``): when the referenced CSV exists,
  values are drawn from the actual table, frequency-weighted, via a
  seeded hash of the row index — real distribution parity.  When the CSV
  is absent (the reference tests clone an external data repo), values
  fall back to deterministic synthetic words so the config still runs.
* **Faker providers**: each ``function_name`` maps to a deterministic
  synthesizer of the same VALUE SHAPE (names, cities, postcodes, dates,
  ``random_element`` honors ``args["elements"]``), seeded per
  (seed, attribute, row), so entropy/token statistics are stable and
  reproducible across any partitioning.

Estimated weights are statistics of synthetic data in both systems; what
matters for parity is that a reference config file runs unmodified and
yields the reference output shape (a JSON list of weighted attribute
configs), which the CLI test asserts.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path
from typing import Callable

__all__ = ["generators_from_config", "GeneratorConfigError"]


class GeneratorConfigError(ValueError):
    pass


_VOWELS = "aeiou"
_CONSONANTS = "bcdfghjklmnprstvw"


def _word(rng: random.Random, min_syll: int = 2, max_syll: int = 3) -> str:
    return "".join(
        rng.choice(_CONSONANTS) + rng.choice(_VOWELS)
        for _ in range(rng.randint(min_syll, max_syll))
    )


def _row_rng(seed: int, attr: str, i: int) -> random.Random:
    # stable across processes/partitions: no PYTHONHASHSEED dependence
    return random.Random(f"{seed}:{attr}:{i}")


def _synth_value(fn_name: str, rng: random.Random, args: dict) -> str:
    """Deterministic stand-in for a Faker provider: same value shape."""
    name = fn_name.lower()
    if name == "random_element":
        elements = list(args.get("elements", ()))
        if not elements:
            raise GeneratorConfigError("random_element requires args.elements")
        return str(rng.choice(elements))
    if name == "random_int":
        lo, hi = int(args.get("min", 0)), int(args.get("max", 9999))
        return str(rng.randint(lo, hi))
    if "postcode" in name or "zipcode" in name:
        return f"{rng.randint(0, 99999):05d}"
    if "phone" in name:
        return f"+49 {rng.randint(100, 999)} {rng.randint(1000000, 9999999)}"
    if "email" in name:
        return f"{_word(rng)}.{_word(rng)}@{_word(rng)}.example"
    if "date" in name or "birth" in name:
        y = rng.randint(1930, 2009)
        return f"{y:04d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    if "street" in name or "address" in name:
        return f"{_word(rng).capitalize()}{rng.choice(['straße', ' street', 'weg'])} {rng.randint(1, 240)}"
    if "city" in name or "municipality" in name:
        return _word(rng).capitalize() + rng.choice(["burg", "stadt", "ville", "ton"])
    if "country" in name:
        return rng.choice(["Germany", "France", "Spain", "Italy", "Sweden", "Portugal"])
    if "company" in name:
        return _word(rng).capitalize() + rng.choice([" GmbH", " AG", " Ltd"])
    # name-like default: first_name*, last_name, name, prefix, …
    return _word(rng, 2, 4).capitalize()


def _freq_table_sampler(path: str, value_columns: list[str], freq_column: str):
    """(rows, cumulative weights) from a Gecko frequency-table CSV, or
    None when the file does not exist (external gecko-data repo)."""
    p = Path(path)
    if not p.exists():
        return None
    rows: list[tuple] = []
    weights: list[int] = []
    with p.open(newline="", encoding="utf-8") as fh:
        for rec in csv.DictReader(fh):
            rows.append(tuple(rec[c] for c in value_columns))
            weights.append(int(float(rec[freq_column])))
    if not rows:
        return None
    cum = []
    total = 0
    for w in weights:
        total += w
        cum.append(total)
    return rows, cum, total


def _gecko_generators(cfg: dict) -> dict[str, Callable[[int], str]]:
    seed = cfg["seed"]
    out: dict[str, Callable[[int], str]] = {}
    for spec in cfg["generators"]:
        attrs = list(spec["attribute_names"])
        fn_name = spec["function_name"]
        args = spec.get("args", {})
        table = None
        if fn_name in ("from_frequency_table", "from_multicolumn_frequency_table"):
            value_columns = args.get("value_columns") or [args.get("value_column")]
            if value_columns == [None]:
                raise GeneratorConfigError(
                    f"{fn_name} requires value_column(s) in args"
                )
            table = _freq_table_sampler(
                args.get("csv_file_path", ""), value_columns, args.get("freq_column", "count")
            )
        spec_key = ",".join(attrs)

        def _make(col_idx: int, attr: str, table=table, spec_key=spec_key,
                  fn_name=fn_name, args=args):
            def _gen(i: int) -> str:
                # one shared draw per spec per row → multicolumn attributes
                # stay jointly consistent (gecko semantics)
                rng = _row_rng(seed, spec_key, i)
                if table is not None:
                    rows, cum, total = table
                    import bisect

                    pick = rng.randrange(total)
                    return rows[bisect.bisect_right(cum, pick)][col_idx]
                return _synth_value(fn_name, rng, args) + (
                    "" if col_idx == 0 else f"_{col_idx}"
                )

            return _gen

        for idx, attr in enumerate(attrs):
            out[attr] = _make(idx, attr)
    return out


def _faker_generators(cfg: dict) -> dict[str, Callable[[int], str]]:
    seed = cfg["seed"]
    out: dict[str, Callable[[int], str]] = {}
    for spec in cfg["generators"]:
        attr = spec["attribute_name"]
        fn_name = spec["function_name"]
        args = spec.get("args", {})

        def _gen(i: int, attr=attr, fn_name=fn_name, args=args) -> str:
            return _synth_value(fn_name, _row_rng(seed, attr, i), args)

        out[attr] = _gen
    return out


def generators_from_config(obj: dict, kind: str):
    """Reference generator-config JSON → (count, {attribute: int→str}).

    ``kind`` ∈ {"gecko", "faker"} — the two reference estimate commands."""
    for field in ("seed", "count", "generators"):
        if field not in obj:
            raise GeneratorConfigError(f"generator config missing `{field}`")
    if kind == "gecko":
        return int(obj["count"]), _gecko_generators(obj)
    if kind == "faker":
        return int(obj["count"]), _faker_generators(obj)
    raise GeneratorConfigError(f"unknown generator kind `{kind}`")
