"""Skew-mitigation micro-bench: measures the operators/skew.py join under a
genuinely pathological key distribution (the driver testdata is uniform, so
skew is synthesized here).

Setup: N fact rows where ``hot_frac`` share ONE key, joined to a 100k-key
dimension that is too large to broadcast (autoBroadcastJoinThreshold=-1
models the 100 TB case where the dim side exceeds broadcast limits). Three
plans over identical inputs:

  plain       shuffle hash join, AQE skew handling OFF — the hot key's
              partition lands on one task (the straggler baseline)
  aqe         same join with AQE skew-join splitting ON — Spark's built-in
              first line of defense
  salted      operators.skew.salted_join_hot_keys — explicit hot-key salting,
              for when the hot keys are known a priori or AQE can't split
              (e.g. the skewed side feeds a downstream keyed agg)

Prints ONE JSON line: {"rows": N, "hot_frac": f, "timings": {...}, "counts": {...}}.
Counts must be equal across plans — a mitigation that changes results is a bug.

Run: python tools/bench_skew.py [--rows 4000000] [--hot-frac 0.85]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators.skew import salted_join_hot_keys
from quill_agent_dashboard_pbi_etl_spark.session import get_spark

HOT_KEY = "agent-hot"
N_DIM = 100_000


def build_inputs(spark, n_rows: int, hot_frac: float):
    """Deterministic skewed fact table + a non-broadcastable dimension."""
    facts = spark.range(n_rows).select(
        F.when(
            (F.col("id") % 1000) < int(hot_frac * 1000), F.lit(HOT_KEY)
        )
        .otherwise(F.concat(F.lit("agent-"), (F.col("id") % N_DIM).cast("string")))
        .alias("AgentID"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(N_DIM).select(
        F.concat(F.lit("agent-"), F.col("id").cast("string")).alias("AgentID"),
        F.concat(F.lit("Name "), F.col("id").cast("string")).alias("AgentName"),
    ).union(
        spark.range(1).select(
            F.lit(HOT_KEY).alias("AgentID"), F.lit("Hot Agent").alias("AgentName")
        )
    )
    # Materialize both sides once so per-plan timings measure the JOIN, not
    # the row synthesis.
    facts = facts.localCheckpoint()
    dim = dim.localCheckpoint()
    return facts, dim


def timed(df) -> tuple[float, int]:
    start = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    elapsed = time.perf_counter() - start
    return elapsed, df.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.85)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    facts, dim = build_inputs(spark, args.rows, args.hot_frac)
    agg = lambda df: df.groupBy("AgentName").agg(  # noqa: E731
        F.sum("v").alias("sv"), F.count("*").alias("c")
    )

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timings["plain"], counts["plain"] = timed(agg(facts.join(dim, "AgentID")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timings["aqe"], counts["aqe"] = timed(agg(facts.join(dim, "AgentID")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timings["salted"], counts["salted"] = timed(
        agg(salted_join_hot_keys(facts, dim, "AgentID", [HOT_KEY], buckets=32))
    )

    print(
        json.dumps(
            {
                "rows": args.rows,
                "hot_frac": args.hot_frac,
                "timings": {k: round(v, 3) for k, v in timings.items()},
                "counts": counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
