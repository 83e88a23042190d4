"""Time-keyed operators: as-of (point-in-time) join and sessionization.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas do); the classic
distributed formulation is a UNION + keyed window with a forward-fill —
one shuffle on the join key, one in-partition sort, no row explosion
(never the naive range-join → O(n·m) pair blowup).  Sessionization is a
lag + running-sum window pair.

Scale notes: both operators shuffle once on the entity key; per-key data
is time-sorted in-partition (Spark's window sort).  Hot keys are the
hazard — mitigate with AQE skew handling, or pre-split giant keys by
coarse time bucket when one entity's history exceeds an executor's
memory (the session/asof semantics compose across ordered sub-splits
when splits overlap by one row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right.on <= left.on`` and the same ``by`` key (at-or-before
    semantics — a right row at the exact same timestamp matches).

    Right-side values arrive as ``<col>_asof`` columns, NULL when no
    right row precedes.  ``tie_col`` breaks ordering ties among right
    rows sharing (by, on) — the largest wins, making the result
    deterministic (mirrors DuckDB ASOF JOIN on a (by, on)-deduped right
    side).

    Implementation: tag sides, union, forward-fill the right values over
    a (by)-partitioned (on, side, tie)-ordered window, keep left rows.
    One shuffle, no range-join explosion.
    """
    lcols = left.columns
    carried = [f"{c}_asof" for c in value_cols]
    clash = [c for c in carried if c in lcols]
    if clash:
        raise ValueError(
            f"asof_join output column(s) {clash} already exist on the left "
            "side — rename the right-side value columns first"
        )

    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(a)
            for c, a in zip(value_cols, carried)
        ],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (by, on)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("__tie"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *lcols,
        "__side",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    return filled.where(F.col("__side") == 1).drop("__side")


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_tie: str | None = None,
) -> DataFrame:
    """Assign per-entity session sequence numbers: a new session starts
    when the gap to the previous event exceeds ``gap``.

    Appends ``session_seq`` (1-based per entity).  Deterministic given a
    ``order_tie`` column for same-timestamp events.  Gap arithmetic is
    exact timestamp-difference intervals (works on TIMESTAMP and
    TIMESTAMP_NTZ alike — no epoch conversion, no timezone dependence).
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tie).asc()] if order_tie else []
    )
    w = Window.partitionBy(by).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        F.when(prev.isNull(), F.lit(1))
        .when(F.col(ts_col) - prev > F.expr(f"INTERVAL {gap}"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
