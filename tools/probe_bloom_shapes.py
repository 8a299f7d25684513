"""Price the beyond-guard Bloom probe SHAPES against each other at sf100.

Round-8 shipped the beyond-guard dispatch (distributed word table + k
broadcast-join probes). The round-8 verdict flagged the k probe joins as
"7x broadcast of an identical table" and prescribed the fold: explode the k
probe positions to rows, join the word table once, re-aggregate per event.
This probe measures the decision instead of taking it:

- **bucketed** — the production shape (operators.dedup.bloom_maybe_flag_
  bucketed, post-fold: one canonical broadcast subplan, per-probe renames
  after the join). Executed-plan audit counts materialized vs reused
  broadcast exchanges: exchange canonicalization erases the per-probe
  aliases, so AQE reuse materializes the word table ONCE and the other k-1
  joins read it through ReusedExchange — broadcast traffic was already 1x,
  which the audit proves per run.
- **exploded** — the verdict's prescribed fold (operators.dedup._bloom_
  maybe_exploded): one broadcast join, but a groupBy over k x events plus
  an event-scale join back — two NEW shuffles of event-sized data where the
  production shape has zero.

Both run as the FULL gate (pre-filter + exact anti-join on the maybes) at
the same forced 1% sizing as the r8 sf100 `bloom_bucketed_sec` cell, so the
r8 number is directly comparable. Survivor counts must match exactly.

Results merge into SCALE_LADDER.json["bloom_probe_shapes"].

Usage: python tools/probe_bloom_shapes.py [ladder_root] [rung]
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import dedup
from quill_agent_dashboard_pbi_etl_spark.operators.materialize import pin
from quill_agent_dashboard_pbi_etl_spark.plans.registry import (
    NOW_ANCHOR,
    normalized_fact,
)
from quill_agent_dashboard_pbi_etl_spark.session import get_spark


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _gate_with(flag_fn, fact, live_keys, num_bits):
    flagged = flag_fn(fact, num_bits)
    return (
        flagged.filter(~F.col("__bloom_maybe"))
        .drop("__bloom_maybe")
        .unionByName(
            flagged.filter(F.col("__bloom_maybe"))
            .drop("__bloom_maybe")
            .join(live_keys, on="dedup_key", how="left_anti")
        )
    )


def main() -> None:
    argv = sys.argv[1:]
    ladder_root = argv[0] if argv else "/root/repo/scale_ladder"
    rung = argv[1] if len(argv) > 1 else "sf100"
    sf_dir = os.path.join(ladder_root, rung)
    if not os.path.isdir(sf_dir):
        sys.exit(f"{sf_dir} missing — run tools/make_scale_ladder.py first")

    now_epoch = int(
        dt.datetime.strptime(NOW_ANCHOR, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )
    spark = get_spark(
        app_name="probe-bloom-shapes",
        # UI on: the executed-plan audit reads the REST SQL endpoint.
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4053"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    fact = pin(
        normalized_fact(spark, sf_dir).withColumnRenamed("EventID", "dedup_key"),
        required=True,
    )
    ledger = pin(
        fact.filter(
            F.col("EventTime") < F.lit("2024-01-10 00:00:00").cast("timestamp")
        ).select(
            F.col("dedup_key").alias("pk"),
            F.col("EventTime").alias("seenAt"),
            (F.unix_timestamp("EventTime") + 14 * 86400).alias("expiresAt"),
        ),
        required=True,
    )
    live_keys = ledger.filter(F.col("expiresAt") >= F.lit(now_epoch)).select(
        F.col("pk").alias("dedup_key")
    )
    live_n = live_keys.count()
    num_bits = max(1 << 16, int(1.44 * live_n * math.log2(1 / 0.01)))

    res: dict = {
        "rung": rung,
        "events": fact.count(),
        "live_keys": live_n,
        "bloom_mbits": round(num_bits / 1e6, 1),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default"),
    }

    def bucketed_flags(df, nbits):
        words = dedup.bloom_words(live_keys, "dedup_key", nbits)
        return dedup.bloom_maybe_flag_bucketed(df, words, nbits, "dedup_key")

    def exploded_flags(df, nbits):
        words = dedup.bloom_words(live_keys, "dedup_key", nbits)
        return dedup._bloom_maybe_exploded(df, words, nbits, "dedup_key")

    counts = {}
    for label, fn in (("bucketed", bucketed_flags), ("exploded", exploded_flags)):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            gated = _gate_with(fn, fact, live_keys, num_bits)
            _noop(gated)
            runs.append(round(time.perf_counter() - t0, 3))
        counts[label] = _gate_with(fn, fact, live_keys, num_bits).count()
        res[f"{label}_sec_runs"] = runs
        res[f"{label}_sec"] = min(runs)

    assert counts["bucketed"] == counts["exploded"], counts
    res["survivors"] = counts["bucketed"]

    # Executed-plan audit of the production shape: ONE materialized
    # broadcast, k-1 reused — proof the "7x broadcast" concern does not
    # survive exchange canonicalization. Read off the REST SQL endpoint:
    # a DataFrame's own queryExecution stays the un-reused INITIAL plan
    # unless that exact QueryExecution ran (plan_audit docstring — this
    # audit recorded 7/0 off the initial plan before the fix).
    sys.path.insert(0, "/root/repo/tools")
    import plan_audit

    probe = bucketed_flags(fact, num_bits)
    _noop(probe)
    plan = plan_audit.last_sql_plan(spark)
    (
        res["bucketed_broadcasts_materialized"],
        res["bucketed_broadcasts_reused"],
    ) = plan_audit.broadcast_reuse_counts(plan)

    path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.setdefault("bloom_probe_shapes", {})[rung] = res
    data["bloom_probe_shapes"]["note"] = (
        "Full-gate wall-clock for the two beyond-guard probe shapes at the "
        "r8 forced 1% sizing; bucketed = production (k map-side probe joins "
        "over ONE materialized broadcast, plan-audited), exploded = the "
        "explode/re-aggregate fold (adds two event-scale shuffles). Minima "
        "of 2 same-process runs."
    )
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
        fh.write("\n")
    print(json.dumps(res, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
