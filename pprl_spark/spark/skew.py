"""Explicit skew handling: deterministic salted joins.

AQE's skew-join split (enabled in session.py) handles most hot keys at
runtime, but it only triggers on sort-merge joins past size thresholds
and cannot help when a single key's rows exceed one executor even after
splitting the *probe* side.  The classic explicit remedy — salt the big
side, replicate the small side — is provided here as a first-class
operator so pipelines can opt in deterministically.

The salt must spread rows OF THE SAME KEY across partitions, so it is
derived from a row-unique column of the big side (``salt_src``), not
from the join key, and not from ``rand()`` — task retries must produce
the same salt or speculative execution breaks exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt_src: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``big`` side against ``small`` on ``on``, spreading
    each hot key over ``n_salt`` shuffle partitions.

    ``salt_src``: a row-unique (or near-unique) column of ``big`` whose
    hash picks the salt — deterministic across retries.  The small side
    is replicated ``n_salt``× (cost: |small|·n_salt rows through the
    shuffle — keep n_salt modest, or broadcast the small side outright
    when it fits).  Result is identical to ``big.join(small, on, how)``.
    """
    if how.replace("_", "") not in ("inner", "left", "leftouter"):
        # right/full outer would emit each unmatched small-side row once
        # PER SALT (n_salt duplicates) — the salted formulation only
        # preserves inner/left semantics
        raise ValueError(
            f"salted_join supports how='inner'/'left' (got {how!r}): outer "
            "small-side rows would duplicate once per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).cast("int")
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
