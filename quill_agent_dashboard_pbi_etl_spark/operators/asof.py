"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Semantics: each left row picks the single right row with the greatest
``right_ts <= left_ts`` within the same key partition (backward as-of, ties
include equality) — the standard "state as of event time" join for snapshot
tables, rates, rosters-over-time, etc.

Implementation is the scale-correct union + carry-forward window, NOT a
range join: tag both sides, union them, and run ``last(value, ignorenulls)``
over (key) ordered by (ts, side) with an unbounded-preceding row frame. One
shuffle on the key, O(n log n_partition) sort, no row explosion — a naive
range join materializes |left|×|right-per-key| candidate pairs; this never
does. (Same approach Flink/KDB use for time-series as-of.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join. Returns every ``left`` row (original columns)
    plus ``value_cols`` carried forward from the latest matching ``right``
    row at or before ``left_ts`` (null when no prior right row exists).

    ``right`` must be deterministic per (on, right_ts) — pre-aggregate ties
    (e.g. ``max_by``) before calling if duplicates are possible.
    """
    left_cols = left.columns
    tagged_left = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    tagged_right = right.select(
        *on, F.col(right_ts).alias("__ts"), *[F.col(c).alias(f"__v_{c}") for c in value_cols]
    ).withColumn("__side", F.lit(0))

    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1), so an exact
    # timestamp match is visible to the left row — ASOF's >= semantics.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *left_cols, *[F.col(f"__asof_{c}").alias(c) for c in value_cols]
    )
