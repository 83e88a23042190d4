"""Token-budget shard packing for training-data writes.

``assign_shards`` gives every document a shard index such that reading
shards in order replays the corpus in ``id_col`` order and each shard
holds ~``budget`` tokens (a document never splits; a shard may overflow
by at most one document).  This is the layout step before
``write.partitionBy(shard_col)`` when producing fixed-size training
shards.

Scale shape — a DISTRIBUTED PREFIX SUM, not a global window:

1. ``repartitionByRange(id)`` puts contiguous id ranges in ascending
   partition order (the only shuffle, and it moves just the projected
   columns).
2. One slim job computes per-partition token totals (≤ #partitions rows
   collected; at 1000 executors that is ~KBs on the driver).
3. The driver prefix-sums those totals into per-partition offsets —
   O(#partitions) work.
4. A ``mapInPandas`` pass adds ``offset + exclusive-cumsum`` per row and
   divides by the budget.  No partition ever sees another partition's
   rows.

A naive ``sum(tokens) OVER (ORDER BY id)`` window forces Catalyst to
single-partition the whole table — the exact bottleneck this module
exists to avoid.  The output is independent of the number of partitions
(verified by the partition-invariance test), because the per-row
exclusive cumulative sum is a pure function of the id order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_shards"]


def assign_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Append ``shard_col``: floor(exclusive-cumulative-tokens / budget)
    in ``id_col`` order.  ``token_col`` must be non-negative and
    non-null; ids are assumed unique (ties would make the order, and so
    the packing, ambiguous)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    # localCheckpoint pins the range partitioning: the totals job and the
    # final mapInPandas pass MUST see identical partition boundaries, and
    # a re-executed range exchange may re-sample them differently
    ranged = (
        df.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .localCheckpoint()
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    # per-partition totals + a range key so the driver can order the
    # partitions by id range (partition ids from a range exchange are
    # already ascending, but ordering by min id is self-evidently right)
    totals = (
        with_pid.groupBy("__pid")
        .agg(F.sum(token_col).alias("__tok"), F.min(id_col).alias("__min_id"))
        .collect()
    )
    offsets: dict[int, int] = {}
    running = 0
    for row in sorted(totals, key=lambda r: r["__min_id"]):
        offsets[row["__pid"]] = running
        running += int(row["__tok"])
    out_schema = with_pid.drop("__pid").schema.add(shard_col, "long")
    cols = [f.name for f in out_schema.fields]

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = None  # running exclusive cumsum within this partition
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["__pid"].iloc[0])
            if carry is None:
                carry = offsets.get(pid, 0)
            toks = pdf[token_col].to_numpy()
            ends = toks.cumsum() + carry
            starts = ends - toks
            carry = int(ends[-1])
            out = pdf.drop(columns=["__pid"]).copy()
            out[shard_col] = starts // budget
            yield out[cols]

    return with_pid.mapInPandas(_assign, schema=out_schema)
