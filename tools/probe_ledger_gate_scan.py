"""A/B for the READ side of the expiry-partitioned ledger layout: the
anti-join GATE scan, flat vs partitioned, at production scale.

Round-12 measured the layout's WRITE-side win (TTL compaction 2.94-3.65x
at 100M rows, SCALE_LADDER.json["ledger_compaction"]); the read-side claim
— that ``read_ledger(now_epoch=...)`` partition-pruning the expired days
makes the gate's ledger scan cheaper than the flat scan+row-filter — so
far rests on a plan assertion only (tests/test_sources_sinks.py asserts
the PartitionFilters entry). This probe wall-measures it:

  flat — ``append_ledger(partition_by_expiry=False)``; the gate reads ALL
         rows and drops expired ones row-level (``expiresAt >= now``).
         Scan cost is O(live + expired).
  part — ``append_ledger(partition_by_expiry=True)``; ``read_ledger(...,
         now_epoch=NOW)`` prunes whole expired ``expiryDay=`` dirs at the
         manifest, the row-level TTL check stays authoritative for the
         boundary day. Scan cost is O(live + 1 boundary day).

The timed unit is ONE production gate: read_ledger -> ledger_gate
(left-anti join of a pre-materialized 1M-event batch) -> count of
survivors. The events batch and the ledger are built and written BEFORE
the timer inside each child; both layouts hold identical logical rows and
the survivor count is asserted equal across all cells (the partitioned
path may only ever be MORE permissive at the manifest, never at the row
level, so any disagreement is a bug).

Falsifiable both ways: with ~50% expired the partitioned scan reads ~half
the bytes, so it should win by well under 2x (join+shuffle cost is shared
and the partitioned layout pays many-small-files listing overhead); if
file-listing overhead dominates at this partition grain, flat wins and
that gets recorded. Protocol per the shipped measurement discipline: one
FRESH JVM per cell, alternated order (flat,part,part,flat), min-of-2,
``ambient_suspect`` recorded at measurement time.

Results -> SCALE_LADDER.json["ledger_gate_scan"].

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python tools/probe_ledger_gate_scan.py \
        [n_rows] [expired_days]
    # child mode (internal): --cell <flat|part> <n_rows> <expired_days>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_common import ambient_suspect  # noqa: E402

N_ROWS_DEFAULT = 100_000_000
N_EVENTS = 1_000_000  # gate batch: half ledger hits, half novel keys
N_DAYS = 15  # uniform expiry spread; NOW mid-range -> ~half expired
NOW_EPOCH = 1_705_000_000  # fixed anchor — determinism across cells
DAY = 86_400


def run_cell(strategy: str, n_rows: int, expired_days: int) -> None:
    """Child: build ledger + events batch in parquet, then time ONE gate
    (read_ledger -> ledger_gate -> survivor count)."""
    import time

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark import sinks
    from quill_agent_dashboard_pbi_etl_spark.operators.dedup import ledger_gate
    from quill_agent_dashboard_pbi_etl_spark.session import get_spark

    spark = get_spark(app_name=f"gate-scan-ab-{strategy}")
    spark.sparkContext.setLogLevel("ERROR")

    base = NOW_EPOCH - expired_days * DAY
    entries = spark.range(n_rows).select(
        F.concat(F.lit("pk-"), F.col("id")).alias("pk"),
        F.timestamp_seconds(F.lit(NOW_EPOCH - 14 * DAY)).alias("seenAt"),
        (F.lit(base) + (F.col("id") % N_DAYS) * DAY + (F.col("id") % DAY)).alias(
            "expiresAt"
        ),
    )
    tmp = tempfile.mkdtemp(prefix=f"gate_ab_{strategy}_")
    ledger = os.path.join(tmp, "ledger")
    sinks.append_ledger(entries, ledger, partition_by_expiry=(strategy == "part"))

    # Events: N_EVENTS keys, even ids collide with ledger pks (live or
    # expired depending on id), odd ids are novel. Materialized to parquet
    # so the timed gate reads a real batch, not a synthetic lineage.
    events_path = os.path.join(tmp, "events")
    (
        spark.range(N_EVENTS)
        .select(
            F.when(
                F.col("id") % 2 == 0,
                F.concat(F.lit("pk-"), (F.col("id") * (n_rows // N_EVENTS))),
            )
            .otherwise(F.concat(F.lit("novel-"), F.col("id")))
            .alias("dedup_key"),
            F.col("id").alias("payload"),
        )
        .write.mode("overwrite")
        .parquet(events_path)
    )

    events = spark.read.parquet(events_path)
    t0 = time.perf_counter()
    led = sinks.read_ledger(
        spark, ledger, now_epoch=(NOW_EPOCH if strategy == "part" else None)
    )
    survivors = ledger_gate(events, led, now_epoch=NOW_EPOCH).count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "strategy": strategy,
                "wall_sec": round(wall, 3),
                "survivors": survivors,
                "n_rows": n_rows,
                "n_events": N_EVENTS,
            }
        )
    )
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else N_ROWS_DEFAULT
    expired_days = int(sys.argv[2]) if len(sys.argv) > 2 else N_DAYS // 2

    order = [("flat", 1), ("part", 1), ("part", 2), ("flat", 2)]
    cells: dict[str, dict] = {}
    for idx, (strategy, rnd) in enumerate(order):
        print(f"=== cell {idx}: {strategy} round {rnd} ===", file=sys.stderr)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--cell",
                strategy,
                str(n_rows),
                str(expired_days),
            ],
            capture_output=True,
            text=True,
            env=dict(os.environ),
            timeout=3600,
        )
        key = f"{strategy}_r{rnd}"
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            cells[key] = {
                "error": (proc.stderr.strip().splitlines() or ["?"])[-1][-300:],
                "ordering": idx,
            }
            continue
        cell = json.loads(proc.stdout.strip().splitlines()[-1])
        cell["ordering"] = idx
        cells[key] = cell
        print(json.dumps(cell), file=sys.stderr)

    # Correctness: the gate's survivor set is layout-invariant — partition
    # pruning only removes fully-expired days the row-level TTL filter
    # would drop anyway. Any disagreement is a bug, not a tuning artifact.
    survivor_counts = {
        c["survivors"] for c in cells.values() if "survivors" in c
    }
    assert len(survivor_counts) <= 1, f"layouts disagree on survivors: {cells}"

    summary: dict = {}
    for strategy in ("flat", "part"):
        walls = [
            c["wall_sec"]
            for k, c in cells.items()
            if k.startswith(strategy) and "wall_sec" in c
        ]
        if walls:
            summary[f"{strategy}_min_sec"] = min(walls)
            summary[f"{strategy}_walls"] = walls
            summary[f"{strategy}_ambient_suspect"] = ambient_suspect(walls)
    if "flat_min_sec" in summary and "part_min_sec" in summary:
        summary["speedup_part_over_flat"] = round(
            summary["flat_min_sec"] / summary["part_min_sec"], 2
        )

    ladder_path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(ladder_path)) if os.path.exists(ladder_path) else {}
    key = f"gate_scan_n{n_rows // 1_000_000}m_exp{expired_days}d"
    data.setdefault("ledger_gate_scan", {})[key] = {
        "cells": cells,
        "summary": summary,
        "expired_days": expired_days,
        "n_days": N_DAYS,
        "n_events": N_EVENTS,
        "note": (
            "One fresh JVM per cell, alternated order, min-of-2; ledger + "
            f"1M-event batch built inside the child ({N_DAYS} expiry days, "
            "~half expired at the fixed NOW anchor), timer covers ONE "
            "production gate: read_ledger -> ledger_gate left-anti -> "
            "survivor count. flat scans live+expired and drops expired "
            "row-level; part partition-prunes expired days at the manifest "
            "(boundary day row-filtered). Survivor counts asserted equal "
            "across layouts."
        ),
    }
    json.dump(data, open(ladder_path, "w"), indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
