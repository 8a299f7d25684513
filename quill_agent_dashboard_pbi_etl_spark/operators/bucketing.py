"""Bucketed-table utilities: co-located joins without per-query shuffles.

At 100 TB the fact↔fact joins (e.g. lineitem↔orders, fact↔ledger) dominate
shuffle volume. Writing both sides bucketed by the join key into the warehouse
lets every subsequent join read co-partitioned data: Spark's planner drops the
exchange on both sides (verify: no ``Exchange`` under the ``SortMergeJoin`` in
``.explain``).

Bucketing requires ``saveAsTable`` (metastore-backed); paths alone don't carry
bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    ``num_buckets`` should be sized so one bucket of the largest table fits
    an executor's memory comfortably (at 100 TB with 1000 executors, think
    thousands of buckets, not 64 — parameterize per deployment). ``path``
    makes it an external table (data outside the warehouse dir).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """Diagnostic: True when a join of the two bucketed tables plans without
    any Exchange (i.e., the bucketing is actually being exploited)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    plan = left.join(right, on=on)._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
