"""Interval (range-containment) join — bucketized for scale.

Spark plans a bare ``l.ts BETWEEN r.start AND r.end`` join as a broadcast
nested loop (or worse, a cartesian product with per-row filtering) — O(|L|·|R|)
per key. The scalable shape is the classic time-bucket trick: explode each
right-side interval into the fixed-size buckets it covers, bucket the left
timestamps the same way, equi-join on (key, bucket), then apply the exact
range predicate as a residual filter. Cost: |R| × avg-buckets-per-interval
extra rows on the (small) interval side, and the join becomes a plain
hash/sort-merge equi-join that partitions, broadcasts, and AQE-splits like
any other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, bucket: str) -> Column:
    return F.date_trunc(bucket, ts)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "DAY",
    inclusive_end: bool = False,
) -> DataFrame:
    """Rows of ``left`` joined to every ``right`` interval containing their
    timestamp: ``start <= ts < end`` (or ``<= end`` with ``inclusive_end``),
    matched within ``key_cols``.

    ``bucket`` granularity should be >= the typical interval length so each
    interval explodes into ~1-2 bucket rows (DAY for shift windows).
    """
    exploded = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket),
                _bucket(F.col(end_col), bucket),
                F.expr(f"INTERVAL 1 {bucket}"),
            )
        ),
    )
    end_pred = (
        F.col(ts_col) <= F.col(end_col)
        if inclusive_end
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        left.withColumn("__bucket", _bucket(F.col(ts_col), bucket))
        .join(exploded, on=[*key_cols, "__bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & end_pred)
        .drop("__bucket")
    )
