"""Directive r13-2: measure live-day FILE ACCUMULATION on the partitioned
streaming ledger over a long drain.

`sinks.append_ledger(partition_by_expiry=True)` writes ONE file per expiry
day per append, so a 1-minute-trigger stream accretes ~1,440 files into
each day's partition before it ages out (~20k files across a 14-day
window), and `compact_ledger` on this layout only ever drops EXPIRED
days — live days are never bin-packed. Every per-trigger gate scan pays
the file-listing/footer cost of the accreted files. This probe drives a
>=500-trigger availableNow drain (1 landing file per trigger, small
batches so the per-trigger wall is dominated by the ledger fixed costs)
and records the per-batch trigger wall CURVE: if listing/footer cost
grows with the file count, the curve shows it (last-decile mean >>
first-decile mean, positive slope); if not, the measured negative gets
recorded and the RUNBOOK keeps the layout as-is.

Cells: `part` (expiry-partitioned ledger — the layout under test) and
`flat` (control: the flat layout accretes root files the same way, but
pays no partition discovery). One fresh JVM per cell, alternated order,
min-of-2 is overkill for a curve — instead each cell reports its own
within-run contrast (first vs last decile), which is ambient-robust by
construction (both deciles ride the same box state unless the box drifts
mid-cell; `ambient_suspect` over decile means flags that).

Results -> SCALE_LADDER.json["ledger_live_day_files"].

Usage:
    SPARK_GRAFT_DRIVER_MEM=12g python tools/probe_live_day_files.py \
        [n_triggers] [events_per_trigger]
    # child mode (internal): --cell <flat|part> <n_triggers> <events_per_trigger>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_TRIGGERS_DEFAULT = 500
EVENTS_PER_TRIGGER_DEFAULT = 50
SF_DIR = "/root/testdata/sf0.1"


def run_cell(strategy: str, n_triggers: int, events_per_trigger: int) -> None:
    import datetime as dt
    import shutil
    import time

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark import sinks
    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.plans.registry import NOW_ANCHOR
    from quill_agent_dashboard_pbi_etl_spark.session import get_spark
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        ENVELOPE_JSON_SCHEMA,
        envelopes_to_webhook_shape,
        start_ledger_gated_fact_sink,
    )

    sys.path.insert(0, "/root/repo/tools")
    from bench_streaming import load_table, write_landing

    spark = get_spark(
        app_name=f"live-day-files-{strategy}",
        extra_conf={
            # keep EVERY batch's progress so the full curve is readable
            # after the drain
            "spark.sql.streaming.numRecentProgressUpdates": str(
                n_triggers + 10
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    now_epoch = int(
        dt.datetime.strptime(NOW_ANCHOR, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )

    work = tempfile.mkdtemp(prefix=f"live_day_files_{strategy}_")
    landing = os.path.join(work, "landing")
    # ONE landing file per trigger; a small time-ordered subsample keeps the
    # per-trigger join/normalize work tiny so the curve isolates the ledger
    # fixed costs (listing + footers + append) that accumulation drives.
    events = (
        load_table(spark, SF_DIR, "events")
        .orderBy("ts")
        .limit(n_triggers * events_per_trigger)
    )
    n_events = write_landing(spark, SF_DIR, landing, n_triggers, events=events)

    ledger = os.path.join(work, "ledger")
    out = os.path.join(work, "out")

    stream = envelopes_to_webhook_shape(
        spark.readStream.schema(ENVELOPE_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    t0 = time.perf_counter()
    q = start_ledger_gated_fact_sink(
        normalize_webhooks(stream),
        ledger,
        out,
        os.path.join(work, "ckpt"),
        available_now=True,
        now_epoch=now_epoch,
        partition_by_expiry=(strategy == "part"),
    )
    q.awaitTermination(7200)
    wall = time.perf_counter() - t0

    raw = [
        x if isinstance(x, dict) else json.loads(x) for x in q.recentProgress
    ]
    prog = [p for p in raw if p.get("numInputRows", 0) > 0]
    durs = [
        (p["batchId"], p["durationMs"]["triggerExecution"]) for p in prog
    ]
    durs.sort()
    ms = [d for _, d in durs]

    # per-expiry-day file counts after the drain (the accumulation itself)
    day_files = {}
    if strategy == "part":
        for d in sorted(os.listdir(ledger)):
            if d.startswith("expiryDay="):
                day_files[d] = sum(
                    1
                    for f in os.listdir(os.path.join(ledger, d))
                    if f.endswith(".parquet")
                )
    else:
        day_files["<root>"] = sum(
            1 for f in os.listdir(ledger) if f.endswith(".parquet")
        )

    n = len(ms)
    decile = max(1, n // 10)
    decile_means = [
        round(sum(ms[i : i + decile]) / len(ms[i : i + decile]))
        for i in range(0, n - n % decile, decile)
    ][:10]
    # least-squares slope in ms per batch over the full curve
    xs = list(range(n))
    xbar, ybar = sum(xs) / n, sum(ms) / n
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ms)) / max(
        1e-9, sum((x - xbar) ** 2 for x in xs)
    )
    first = ms[:decile]
    last = ms[-decile:]

    facts = spark.read.parquet(out).count()
    print(
        json.dumps(
            {
                "strategy": strategy,
                "n_batches": n,
                "events_in": n_events,
                "facts_out": facts,
                "wall_sec": round(wall, 1),
                "first_decile_mean_ms": round(sum(first) / len(first)),
                "last_decile_mean_ms": round(sum(last) / len(last)),
                "last_over_first": round(
                    (sum(last) / len(last)) / (sum(first) / len(first)), 3
                ),
                "slope_ms_per_batch": round(slope, 3),
                "decile_means_ms": decile_means,
                "ledger_files": day_files,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    n_triggers = int(sys.argv[1]) if len(sys.argv) > 1 else N_TRIGGERS_DEFAULT
    per = (
        int(sys.argv[2]) if len(sys.argv) > 2 else EVENTS_PER_TRIGGER_DEFAULT
    )

    cells: dict[str, dict] = {}
    for strategy in ("part", "flat"):
        print(f"=== cell {strategy} ===", file=sys.stderr)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--cell",
                strategy,
                str(n_triggers),
                str(per),
            ],
            capture_output=True,
            text=True,
            env=dict(os.environ),
            timeout=7200,
        )
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            cells[strategy] = {
                "error": (proc.stderr.strip().splitlines() or ["?"])[-1][-300:]
            }
            continue
        cells[strategy] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(cells[strategy]), file=sys.stderr)

    vals = {c["facts_out"] for c in cells.values() if "facts_out" in c}
    assert len(vals) <= 1, f"layouts disagree on facts_out: {cells}"

    ladder_path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(ladder_path)) if os.path.exists(ladder_path) else {}
    key = f"t{n_triggers}_e{per}"
    data.setdefault("ledger_live_day_files", {})[key] = {
        "cells": cells,
        "note": (
            "Directive r13-2: per-trigger wall CURVE over a long drain as "
            "the live expiry day accretes one ledger file per append "
            "(maxFilesPerTrigger=1, small batches, empty-start ledger). "
            "The question is whether the per-trigger listing/footer cost "
            "grows with the accreted file count: last_over_first >> 1 and "
            "a positive slope say yes (then bin-pack closed live days "
            "under the lock); a flat curve is the recorded negative. The "
            "flat-layout cell is the control (same file accretion, no "
            "partition discovery)."
        ),
    }
    json.dump(data, open(ladder_path, "w"), indent=1)
    print(json.dumps({"cells": cells}))


if __name__ == "__main__":
    main()
