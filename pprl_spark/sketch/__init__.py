"""Mergeable sketch library (from scratch, per BASELINE.json north_rule).

HyperLogLog / count-min / Bloom / KLL / t-digest with explicit binary
serialization and associative+commutative ``merge``, plus the two-phase
Spark aggregation (`spark_agg`).  Error bounds per PAPERS.md / BASELINE.md.
"""

from .base import Sketch, deserialize  # noqa: F401
from .bloom import BloomFilter  # noqa: F401
from .cms import CountMinSketch  # noqa: F401
from .frequent import FrequentItemsSketch  # noqa: F401
from .hll import HyperLogLog  # noqa: F401
from .kll import KLLSketch  # noqa: F401
from .spark_agg import (  # noqa: F401
    frequent_items,
    profile_column,
    sketch_column,
    sketch_column_with_exact,
    sketch_grouped,
)
from .tdigest import TDigest  # noqa: F401
from .theta import ThetaSketch  # noqa: F401
