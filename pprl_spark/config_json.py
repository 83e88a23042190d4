"""JSON wire-format serde for config objects.

Parity: the reference reads request configs from JSON files
(packages/pprl_client/pprl_client/cli.py:29-38 ``_parse_json_file_into``)
shaped by the pydantic models in packages/pprl_model/pprl_model/{mask,
match,transform}.py — snake_case fields, discriminated unions on
``type`` (filters) / ``name`` (strategies, hardeners, transformers).
These functions let a reference user's existing config files drive this
engine's ``mask()``/``match_*()``/``transform()`` unmodified, and write
configs back in the same shape.

Accepted input shapes:

* a bare config object (the ``config`` payload), or
* a request envelope — ``{"config": …, "attributes": […]}`` for mask
  (reference ``BaseMaskRequest``), ``{"config": …,
  "attribute_transformers": […], "global_transformers": {…}}`` for
  transform (``BaseTransformRequest``), ``{"config": …}`` for match.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from .config import (
    AttributeSalt,
    AttributeTransformerConfig,
    CLKFilter,
    CLKRBFFilter,
    HardenerConfig,
    HashConfig,
    HashFunctionConfig,
    MaskConfig,
    MatchConfig,
    RBFFilter,
    StaticAttributeConfig,
    TransformConfig,
    TransformerSpec,
    WeightedAttributeConfig,
)

__all__ = [
    "mask_config_from_json",
    "mask_config_to_json",
    "match_config_from_json",
    "match_config_to_json",
    "transform_config_from_json",
    "transform_config_to_json",
    "weighted_attributes_to_json",
    "weighted_attributes_from_json",
    "load_json_config",
]


def _as_obj(data: "str | bytes | dict | Path") -> dict:
    if isinstance(data, Path):
        return json.loads(data.read_text())
    if isinstance(data, (str, bytes)):
        return json.loads(data)
    return data


def load_json_config(path: "str | Path", kind: str):
    """Read a reference-format JSON config file; ``kind`` ∈
    {mask, match, transform}."""
    obj = json.loads(Path(path).read_text())
    return {
        "mask": mask_config_from_json,
        "match": match_config_from_json,
        "transform": transform_config_from_json,
    }[kind](obj)


# ------------------------------------------------------------------ mask

def _salt_from(obj: "dict | None") -> "AttributeSalt | None":
    if obj is None:
        return None
    return AttributeSalt(value=obj.get("value"), attribute=obj.get("attribute"))


def _salt_to(salt: "AttributeSalt | None"):
    if salt is None:
        return None
    return {"value": salt.value, "attribute": salt.attribute}


def _filter_from(obj: dict):
    ftype = obj.get("type")
    if ftype == "clk":
        return CLKFilter(obj["filter_size"], obj["hash_values"])
    if ftype == "rbf":
        return RBFFilter(obj["hash_values"], obj["seed"])
    if ftype == "clkrbf":
        return CLKRBFFilter(obj["hash_values"])
    raise ValueError(f"unimplemented filter type `{ftype}`")


def _filter_to(flt) -> dict:
    if flt.type == "clk":
        return {"type": "clk", "filter_size": flt.filter_size, "hash_values": flt.hash_values}
    if flt.type == "rbf":
        return {"type": "rbf", "hash_values": flt.hash_values, "seed": flt.seed}
    return {"type": "clkrbf", "hash_values": flt.hash_values}


def _hardener_from(obj: dict) -> HardenerConfig:
    return HardenerConfig(
        name=obj["name"],
        seed=obj.get("seed"),
        probability=obj.get("probability"),
        window_size=obj.get("window_size"),
        window_step=obj.get("window_step"),
        samples=obj.get("samples"),
    )


def _hardener_to(h: HardenerConfig) -> dict:
    out: dict[str, Any] = {"name": h.name}
    for key in ("seed", "probability", "window_size", "window_step", "samples"):
        value = getattr(h, key)
        if value is not None:
            out[key] = value
    return out


def _attribute_from(obj: dict):
    if "weight" in obj or "average_token_count" in obj:
        if "weight" not in obj or "average_token_count" not in obj:
            raise ValueError(
                f"weighted attribute config for "
                f"`{obj.get('attribute_name', '?')}` requires both `weight` "
                f"and `average_token_count`"
            )
        return WeightedAttributeConfig(
            attribute_name=obj["attribute_name"],
            weight=obj["weight"],
            average_token_count=obj["average_token_count"],
            salt=_salt_from(obj.get("salt")),
        )
    return StaticAttributeConfig(
        attribute_name=obj["attribute_name"], salt=_salt_from(obj.get("salt"))
    )


def _attribute_to(attr) -> dict:
    out: dict[str, Any] = {"attribute_name": attr.attribute_name, "salt": _salt_to(attr.salt)}
    if isinstance(attr, WeightedAttributeConfig):
        out["weight"] = attr.weight
        out["average_token_count"] = attr.average_token_count
    return out


def mask_config_from_json(data) -> MaskConfig:
    obj = _as_obj(data)
    attributes = obj.get("attributes", [])
    cfg = obj.get("config", obj if "hash" in obj else None)
    if cfg is None:
        raise ValueError("not a mask config/request JSON object")
    hash_obj = cfg["hash"]
    fn = hash_obj["function"]
    strategy = hash_obj["strategy"]
    strategy_name = strategy["name"] if isinstance(strategy, dict) else strategy
    return MaskConfig(
        filter=_filter_from(cfg["filter"]),
        hash=HashConfig(
            HashFunctionConfig(tuple(fn["algorithms"]), fn.get("key")), strategy_name
        ),
        token_size=cfg["token_size"],
        padding=cfg.get("padding", ""),
        prepend_attribute_name=cfg.get("prepend_attribute_name", True),
        hardeners=tuple(_hardener_from(h) for h in cfg.get("hardeners", [])),
        attributes=tuple(_attribute_from(a) for a in attributes),
    )


def mask_config_to_json(cfg: MaskConfig, indent: "int | None" = None) -> str:
    """Reference ``BaseMaskRequest`` shape: {"config": …, "attributes": […]}."""
    obj = {
        "config": {
            "token_size": cfg.token_size,
            "hash": {
                "function": {
                    "algorithms": list(cfg.hash.function.algorithms),
                    "key": cfg.hash.function.key,
                },
                "strategy": {"name": cfg.hash.strategy},
            },
            "prepend_attribute_name": cfg.prepend_attribute_name,
            "filter": _filter_to(cfg.filter),
            "padding": cfg.padding,
            "hardeners": [_hardener_to(h) for h in cfg.hardeners],
        },
        "attributes": [_attribute_to(a) for a in cfg.attributes],
    }
    return json.dumps(obj, indent=indent)


def weighted_attributes_to_json(attrs, indent: "int | None" = None) -> str:
    """The reference ``estimate`` commands write the resulting weighted
    attribute configs as a JSON list with ``exclude_none=True``
    (cli.py:405-408) — null salts are omitted, same shape here."""
    out = []
    for a in attrs:
        obj = _attribute_to(a)
        if obj.get("salt") is None:
            obj.pop("salt", None)
        out.append(obj)
    return json.dumps(out, indent=indent)


def weighted_attributes_from_json(data) -> tuple:
    obj = _as_obj(data)
    return tuple(_attribute_from(a) for a in obj)


# ----------------------------------------------------------------- match

def match_config_from_json(data) -> MatchConfig:
    """Parse the reference ``MatchConfig`` wire shape including ``method``
    (pprl_model/match.py:20-23, default crosswise) — a reference user's
    pairwise request file must dispatch to pairwise matching, not silently
    run crosswise (ADVICE r2).  Unknown methods raise (MatchConfig
    validates)."""
    obj = _as_obj(data)
    cfg = obj.get("config", obj)
    return MatchConfig(
        measure=cfg["measure"],
        threshold=cfg["threshold"],
        method=cfg.get("method", "crosswise"),
    )


def match_config_to_json(cfg: MatchConfig, indent: "int | None" = None) -> str:
    return json.dumps(
        {"config": {"measure": cfg.measure, "threshold": cfg.threshold,
                    "method": cfg.method}},
        indent=indent,
    )


# ------------------------------------------------------------- transform

def _transformer_from(obj: dict) -> TransformerSpec:
    return TransformerSpec(
        name=obj["name"],
        characters=obj.get("characters"),
        decimal_places=obj.get("decimal_places"),
        input_format=obj.get("input_format"),
        output_format=obj.get("output_format"),
        mapping=obj.get("mapping"),
        default_value=obj.get("default_value"),
        inline=obj.get("inline", False),
        algorithm=obj.get("algorithm"),
    )


def _transformer_to(spec: TransformerSpec) -> dict:
    out: dict[str, Any] = {"name": spec.name}
    for key in ("characters", "decimal_places", "input_format", "output_format",
                "mapping", "default_value", "algorithm"):
        value = getattr(spec, key)
        if value is not None:
            out[key] = value
    if spec.name == "mapping":
        out["inline"] = spec.inline
    return out


def transform_config_from_json(data) -> TransformConfig:
    obj = _as_obj(data)
    # envelope shape carries the empty_value policy under "config"; the
    # bare-config shape carries it at top level — falling back to {} here
    # would silently downgrade an explicit "error" policy to "ignore"
    cfg = obj.get("config", obj)
    global_t = obj.get("global_transformers", {})
    return TransformConfig(
        empty_value=cfg.get("empty_value", "ignore"),
        attribute_transformers=tuple(
            AttributeTransformerConfig(
                attribute_name=a["attribute_name"],
                transformers=tuple(_transformer_from(t) for t in a["transformers"]),
            )
            for a in obj.get("attribute_transformers", [])
        ),
        global_before=tuple(_transformer_from(t) for t in global_t.get("before", [])),
        global_after=tuple(_transformer_from(t) for t in global_t.get("after", [])),
    )


def transform_config_to_json(cfg: TransformConfig, indent: "int | None" = None) -> str:
    obj = {
        "config": {"empty_value": cfg.empty_value},
        "attribute_transformers": [
            {
                "attribute_name": a.attribute_name,
                "transformers": [_transformer_to(t) for t in a.transformers],
            }
            for a in cfg.attribute_transformers
        ],
        "global_transformers": {
            "before": [_transformer_to(t) for t in cfg.global_before],
            "after": [_transformer_to(t) for t in cfg.global_after],
        },
    }
    return json.dumps(obj, indent=indent)
