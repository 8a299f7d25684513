"""Skew mitigation utilities for 100 TB joins/aggregations.

First line of defense is AQE's skew-join splitting (on by default in
``session.get_spark``); these helpers cover the cases AQE can't fix:
aggregations over a hot key, and joins where one side's key distribution is
pathological and known a priori (the reference model's natural hot key is
``AgentID='unknown'`` — every event missing both owner_id and user_id lands
on it, aloware.adapter.ts:84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Attach a salt column in [0, buckets) for load spreading. The salt is
    derived from a per-row unique id, never from the data, and never appears
    in results — it only exists to split one reducer's key into ``buckets``.

    ``pmod`` (not ``abs % n``): ``abs(hash(x))`` raises ARITHMETIC_OVERFLOW
    under ANSI mode when hash() returns Integer.MIN_VALUE — a 2^-32 per-row
    event that is a near-certainty over trillions of rows."""
    return df.withColumn(
        salt_col,
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets)).cast("int"),
    )


def salted_agg_count(
    df: DataFrame, keys: list[str], buckets: int = 16, count_alias: str = "cnt"
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial count on
    (keys + salt) spreads the hot key over ``buckets`` reducers, then a
    cheap final combine on keys alone.

    Spark's hash aggregate already does map-side partial aggregation, which
    usually suffices; reach for this when a single key's *reduce-side* state
    still overwhelms one task (distinct-heavy or collect-heavy aggs).
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(F.count("*").alias("__partial"))
    return partial.groupBy(*keys).agg(
        F.sum("__partial").cast("long").alias(count_alias)
    )


def salted_join_hot_keys(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list[str],
    buckets: int = 8,
) -> DataFrame:
    """Skew-join for a known hot-key list: fact rows with hot keys get a
    random salt; the dim side is replicated ``buckets``× for those keys so
    every salted partition finds its match; cold keys join unsalted (salt 0).
    One union, no cross-join blowup, deterministic results.
    """
    spark = facts.sparkSession
    hot = F.col(key).isin(*hot_keys)
    fact_salted = facts.withColumn(
        "__salt",
        F.when(
            hot, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets))
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    salts = spark.range(buckets).select(F.col("id").cast("int").alias("__salt"))
    dim_hot = dim.filter(hot).crossJoin(broadcast(salts))
    dim_cold = dim.filter(~hot).withColumn("__salt", F.lit(0).cast("int"))
    dim_replicated = dim_cold.unionByName(dim_hot)
    return fact_salted.join(dim_replicated, on=[key, "__salt"], how="left").drop(
        "__salt"
    )
