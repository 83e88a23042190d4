"""Configuration dataclasses (driver-side, broadcast to executors).

Mirrors the semantics of the reference's pydantic models
(/root/reference/packages/pprl_model/pprl_model/mask.py, match.py,
transform.py) as plain dataclasses: configs are validated once on the
driver, then captured by closure into Arrow-batched UDFs — never shipped
per-row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

__all__ = [
    "HashFunctionConfig",
    "HashConfig",
    "CLKFilter",
    "RBFFilter",
    "CLKRBFFilter",
    "AttributeSalt",
    "StaticAttributeConfig",
    "WeightedAttributeConfig",
    "HardenerConfig",
    "MaskConfig",
    "MatchConfig",
    "TransformerSpec",
    "AttributeTransformerConfig",
    "TransformConfig",
]

_STRATEGIES = {"double_hash", "triple_hash", "enhanced_double_hash", "random_hash"}
_ALGORITHMS = {"md5", "sha1", "sha256", "sha512"}
_HARDENERS = {"balance", "xor_fold", "permute", "randomized_response", "rule_90", "rehash"}
_MEASURES = {"dice", "cosine", "jaccard"}


@dataclass(frozen=True)
class HashFunctionConfig:
    """Digest chain; ``key`` switches every stage to HMAC (model mask.py:43-45)."""
    algorithms: tuple[str, ...]
    key: Optional[str] = None

    def __post_init__(self):
        if not self.algorithms:
            raise ValueError("at least one hash algorithm is required")
        bad = [a for a in self.algorithms if a not in _ALGORITHMS]
        if bad:
            raise ValueError(f"unimplemented hash function in `{'`, `'.join(bad)}`")
        object.__setattr__(self, "algorithms", tuple(self.algorithms))


@dataclass(frozen=True)
class HashConfig:
    function: HashFunctionConfig
    strategy: str = "double_hash"

    def __post_init__(self):
        if self.strategy not in _STRATEGIES:
            raise ValueError(f"unimplemented hash strategy `{self.strategy}`")


@dataclass(frozen=True)
class CLKFilter:
    filter_size: int
    hash_values: int
    type: str = "clk"

    def __post_init__(self):
        if self.filter_size <= 0 or self.hash_values <= 0:
            raise ValueError("filter_size and hash_values must be positive")


@dataclass(frozen=True)
class RBFFilter:
    hash_values: int
    seed: int
    type: str = "rbf"

    def __post_init__(self):
        if self.hash_values <= 0:
            raise ValueError("hash_values must be positive")


@dataclass(frozen=True)
class CLKRBFFilter:
    hash_values: int
    type: str = "clkrbf"

    def __post_init__(self):
        if self.hash_values <= 0:
            raise ValueError("hash_values must be positive")


@dataclass(frozen=True)
class AttributeSalt:
    """Literal salt value XOR salt drawn from another attribute
    (model mask.py:132-144)."""
    value: Optional[str] = None
    attribute: Optional[str] = None

    def __post_init__(self):
        if self.value and self.attribute:
            raise ValueError("value and attribute cannot be set at the same time")
        if not self.value and not self.attribute:
            raise ValueError("neither value nor attribute is set")


@dataclass(frozen=True)
class StaticAttributeConfig:
    attribute_name: str
    salt: Optional[AttributeSalt] = None


@dataclass(frozen=True)
class WeightedAttributeConfig:
    attribute_name: str
    weight: float
    average_token_count: float
    salt: Optional[AttributeSalt] = None

    def __post_init__(self):
        if self.weight <= 0 or self.average_token_count <= 0:
            raise ValueError("weight and average_token_count must be positive")


@dataclass(frozen=True)
class HardenerConfig:
    """One hardener stage; ``params`` keys per variant:
    permute→seed; randomized_response→seed, probability;
    rehash→window_size, window_step, samples."""
    name: str
    seed: Optional[int] = None
    probability: Optional[float] = None
    window_size: Optional[int] = None
    window_step: Optional[int] = None
    samples: Optional[int] = None

    def __post_init__(self):
        if self.name not in _HARDENERS:
            raise ValueError(f"unimplemented hardener in `{self.name}`")
        if self.name == "permute" and self.seed is None:
            raise ValueError("permute hardener requires a seed")
        if self.name == "randomized_response":
            if self.seed is None or self.probability is None:
                raise ValueError("randomized_response requires seed and probability")
            if not (0 <= self.probability <= 1):
                raise ValueError("probability must be in [0, 1]")
        if self.name == "rehash":
            if not all(v is not None and v > 0 for v in (self.window_size, self.window_step, self.samples)):
                raise ValueError("rehash requires positive window_size, window_step, samples")
            if self.window_size > 32:
                raise ValueError("rehash window_size must be <= 32")


@dataclass(frozen=True)
class MaskConfig:
    """Full mask stage config (model mask.py:123-129).

    ``attributes`` must be StaticAttributeConfig for CLK (optional) and
    WeightedAttributeConfig for RBF/CLKRBF (required) — validated like
    model mask.py:174-197.
    """
    filter: "CLKFilter | RBFFilter | CLKRBFFilter"
    hash: HashConfig
    token_size: int = 2
    padding: str = ""
    prepend_attribute_name: bool = True
    hardeners: tuple[HardenerConfig, ...] = ()
    attributes: tuple = ()

    def __post_init__(self):
        if self.token_size <= 1:
            raise ValueError("token_size must be > 1")
        object.__setattr__(self, "hardeners", tuple(self.hardeners))
        object.__setattr__(self, "attributes", tuple(self.attributes))
        if self.filter.type == "clk":
            if self.attributes and not all(isinstance(a, StaticAttributeConfig) for a in self.attributes):
                raise ValueError(
                    "`clk` filters require static attribute configurations, but weighted ones were found"
                )
        else:
            if not self.attributes:
                raise ValueError(
                    f"`{self.filter.type}` filters require weighted attribute configurations, "
                    f"but none were found"
                )
            if not all(isinstance(a, WeightedAttributeConfig) for a in self.attributes):
                raise ValueError(
                    f"`{self.filter.type}` filters require weighted attribute configurations, "
                    f"but static ones were found"
                )

    def attribute_config(self, name: str):
        for a in self.attributes:
            if a.attribute_name == name:
                return a
        return None


@dataclass(frozen=True)
class MatchConfig:
    """Match stage config (model match.py:20-23).  ``method`` mirrors the
    reference ``MatchMethod`` enum (match.py:9-11): ``crosswise`` (full
    product) or ``pairwise`` (positional zip of equal-length lists)."""
    measure: str = "dice"
    threshold: float = 0.7
    method: str = "crosswise"

    def __post_init__(self):
        if self.measure not in _MEASURES:
            raise ValueError(f"unimplemented similarity measure `{self.measure}`")
        if self.method not in ("crosswise", "pairwise"):
            raise ValueError(f"unimplemented match method `{self.method}`")
        if not (0 <= self.threshold <= 1):
            raise ValueError("threshold must be in [0, 1]")


@dataclass(frozen=True)
class TransformerSpec:
    """One transformer; ``name`` ∈ {character_filter, normalization, number,
    date_time, mapping, phonetic_code} with variant-specific fields
    (model transform.py)."""
    name: str
    characters: Optional[str] = None
    decimal_places: Optional[int] = None
    input_format: Optional[str] = None
    output_format: Optional[str] = None
    mapping: Optional[dict] = None
    default_value: Optional[str] = None
    inline: bool = False
    algorithm: Optional[str] = None


@dataclass(frozen=True)
class AttributeTransformerConfig:
    attribute_name: str
    transformers: tuple[TransformerSpec, ...] = ()


@dataclass(frozen=True)
class TransformConfig:
    """empty_value ∈ {ignore, skip, error} (model transform.py:16-17)."""
    empty_value: str = "ignore"
    attribute_transformers: tuple[AttributeTransformerConfig, ...] = ()
    global_before: tuple[TransformerSpec, ...] = ()
    global_after: tuple[TransformerSpec, ...] = ()

    def __post_init__(self):
        if self.empty_value not in {"ignore", "skip", "error"}:
            raise ValueError(f"invalid empty_value policy `{self.empty_value}`")
        if not (self.attribute_transformers or self.global_before or self.global_after):
            raise ValueError("at least one transformer is required")
