"""A/B for the two TTL-compaction paths of ``sinks.compact_ledger``:

  flat — the locked scratch-write + two-rename rewrite
         (``rewrite_ledger_atomic``): scan ALL live+expired rows, write the
         live ones back. Cost scales with the LIVE ledger.
  part — the expiry-partitioned layout (``append_ledger(...,
         partition_by_expiry=True)``): count the expired ``expiryDay=``
         partitions, then drop those directories under the same lock.
         Cost scales with the EXPIRED slice only.

The structural claim being tested: partition-drop compaction is O(expired)
while the rewrite is O(live + expired) — so the gap should WIDEN as the
live fraction grows, and `part` must never lose. Protocol per the shipped
measurement discipline: one FRESH JVM per cell, strategies alternated
across rounds (flat→part, part→flat), min-of-2 per strategy,
`ambient_suspect` flag (probe_common) recorded at measurement time. The
ledger is built INSIDE each child before the timer starts; both layouts
hold identical logical rows; dropped-row counts are asserted equal.

Results → SCALE_LADDER.json["ledger_compaction"]["rewrite_vs_partition_drop"].

The structural prediction is falsifiable by the second knob: with FEWER
expired days (larger live fraction) the rewrite must get SLOWER (it writes
more back) while the partition drop gets FASTER (it counts less) — the
speedup widens. Both configurations are recorded side by side.

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python tools/probe_ledger_compact.py \
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

N_ROWS_DEFAULT = 20_000_000
N_DAYS = 15  # uniform expiry spread; NOW sits mid-range → ~half expired
NOW_EPOCH = 1_705_000_000  # fixed anchor — determinism across cells
DAY = 86_400


def run_cell(strategy: str, n_rows: int, expired_days: int) -> None:
    """Child: build the ledger in the chosen layout, then time ONE
    compaction call (the maintenance job's unit of work)."""
    import time

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark import sinks
    from quill_agent_dashboard_pbi_etl_spark.session import get_spark

    spark = get_spark(app_name=f"compact-ab-{strategy}")
    spark.sparkContext.setLogLevel("ERROR")

    # Expiry spread: N_DAYS uniform days with `expired_days` of them fully
    # past NOW (plus the boundary day). Partitions at production grain.
    base = NOW_EPOCH - expired_days * DAY
    entries = spark.range(n_rows).select(
        F.concat(F.lit("pk-"), F.col("id")).alias("pk"),
        F.timestamp_seconds(F.lit(NOW_EPOCH - 14 * DAY)).alias("seenAt"),
        (F.lit(base) + (F.col("id") % N_DAYS) * DAY + (F.col("id") % DAY)).alias(
            "expiresAt"
        ),
    )
    tmp = tempfile.mkdtemp(prefix=f"compact_ab_{strategy}_")
    ledger = os.path.join(tmp, "ledger")
    sinks.append_ledger(entries, ledger, partition_by_expiry=(strategy == "part"))

    t0 = time.perf_counter()
    dropped = sinks.compact_ledger(spark, ledger, now_epoch=NOW_EPOCH)
    wall = time.perf_counter() - t0
    left = sinks.read_ledger(spark, ledger).count()
    print(
        json.dumps(
            {
                "strategy": strategy,
                "wall_sec": round(wall, 3),
                "dropped": dropped,
                "rows_left": left,
                "n_rows": n_rows,
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

    # Correctness cross-checks. The two layouts drop DIFFERENT counts by
    # design: flat drops every expired ROW, the partitioned path keeps the
    # boundary day whole (its expired rows retire at the next day's run,
    # row-level TTL gates them meanwhile) — so part_dropped ≤ flat_dropped,
    # rows are conserved per cell, and each strategy is deterministic.
    for c in cells.values():
        if "dropped" in c:
            assert c["dropped"] + c["rows_left"] == c["n_rows"], c
    for strategy in ("flat", "part"):
        per = {
            (c["dropped"], c["rows_left"])
            for k, c in cells.items()
            if k.startswith(strategy) and "dropped" in c
        }
        assert len(per) <= 1, f"{strategy} rounds disagree: {cells}"
    flat_drop = next(
        (c["dropped"] for k, c in cells.items() if k.startswith("flat") and "dropped" in c),
        None,
    )
    part_drop = next(
        (c["dropped"] for k, c in cells.items() if k.startswith("part") and "dropped" in c),
        None,
    )
    if flat_drop is not None and part_drop is not None:
        assert part_drop <= flat_drop, f"partition drop exceeded row drop: {cells}"

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
    key = f"rewrite_vs_partition_drop_n{n_rows // 1_000_000}m_exp{expired_days}d"
    data.setdefault("ledger_compaction", {})[key] = {
        "cells": cells,
        "summary": summary,
        "expired_days": expired_days,
        "n_days": N_DAYS,
        "note": (
            "One fresh JVM per cell, alternated order, min-of-2; ledger "
            f"built inside the child ({N_DAYS} expiry days, ~half expired "
            "at the fixed NOW anchor), timer covers ONE compact_ledger "
            "call. flat = locked rewrite (O(live+expired) scan+write), "
            "part = expiry-partition drop (O(expired) count + dir "
            "deletes). Dropped counts differ BY DESIGN: part keeps the "
            "boundary day whole (retires next run), so part_dropped <= "
            "flat_dropped — asserted, along with per-cell row conservation "
            "and per-strategy determinism."
        ),
    }
    json.dump(data, open(ladder_path, "w"), indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
