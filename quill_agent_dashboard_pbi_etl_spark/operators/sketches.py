"""Count-min sketch over DataFrame keys (north-star approximate tier).

The 100 TB companion to exact heavy-hitter counting: a ``depth × width``
counter matrix whose memory is FIXED (default 4 × 8192 = 32k counters)
regardless of key cardinality, mergeable across partitions/batches (counter
tables add), with the classic guarantee ``true ≤ est ≤ true + (e/width)·N``
(per-query failure prob ≈ e^-depth). Built entirely from column expressions —
the "sketch" is just a (seed, bucket) groupBy, so Spark's partial aggregation
IS the sketch merge, and no driver-side state exists at all (contrast with
the bitmap in :mod:`dedup`'s Bloom gate, which is driver-sized by design).

Point queries are an equi-join of the probe keys' (seed, bucket) pairs
against the counter table + a min-over-seeds — the pattern that lets a
dashboard answer "how often did THESE 50 tokens occur" over a corpus whose
distinct-token table would never fit anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hash-seed base: keep CMS hashing disjoint from the Bloom/LSH families
_SEED_BASE = 1000


def cms_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """One pass → the (seed, bucket, cnt) counter table. Each input row
    increments ``depth`` counters at ``xxhash64(key, seed) mod width``."""
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("seed"),
                            F.pmod(
                                F.xxhash64(F.col(key_col), F.lit(_SEED_BASE + i)),
                                F.lit(width),
                            ).alias("bucket"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("sb")
        )
        .groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point-query the sketch: (key, cms_est) per distinct input key, where
    ``cms_est`` = min over the key's ``depth`` counters (0 if a counter row
    is absent — an empty bucket). The probe side is small (the candidate
    set); the counter table is ≤ depth·width rows, so the join broadcasts."""
    probes = (
        keys.select(key_col)
        .distinct()
        .select(
            F.col(key_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("seed"),
                            F.pmod(
                                F.xxhash64(F.col(key_col), F.lit(_SEED_BASE + i)),
                                F.lit(width),
                            ).alias("bucket"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("sb"),
        )
        .select(F.col(key_col), F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    )
    return (
        probes.join(counters, ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
