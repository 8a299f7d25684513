"""Directive r13-2 fix A/B: per-trigger gate cost of an ACCRETED 14-day
partitioned ledger (one file per append — the steady state a 1-minute
streaming sink reaches, ~1,000 files/day here) vs the same rows PACKED to
one file per day, vs accreted-then-`binpack_ledger_closed_days` (the fix
actually applied, pack wall reported).

The live-day accumulation probe (`probe_live_day_files.py`) measured the
per-file cost ~1.4-2.0 ms/trigger as ONE day accretes to 500 files; the
production pain is the standing 14-day window (~14k files) that every
per-trigger gate scan re-lists. This probe measures that steady state
directly with the same 8-batch sf0.1 availableNow drain as the layout
A/B: identical rows in every cell, facts_out asserted equal, per-batch
trigger walls from query progress.

All cells keep the ledger estimate ABOVE the broadcast threshold (14M
live keys, ~70+ MB), so the gate join is a healthy sort-merge in every
cell and the contrast isolates listing/footer cost.

Results -> SCALE_LADDER.json["ledger_binpack_gate"].

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python tools/probe_binpack_gate.py \
        [rows_per_day] [files_per_day] [n_batches]
    # child mode (internal): --cell <accreted|packed|binpacked> <rows> <files> <batches>
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

ROWS_PER_DAY_DEFAULT = 1_000_000
FILES_PER_DAY_DEFAULT = 1_000
N_BATCHES_DEFAULT = 8
N_DAYS = 14
DAY = 86_400
SF_DIR = "/root/testdata/sf0.1"


def run_cell(
    strategy: str, rows_per_day: int, files_per_day: int, n_batches: int
) -> None:
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
        envelopes_to_webhook_shape,
        read_envelope_stream,
        start_ledger_gated_fact_sink,
    )

    sys.path.insert(0, "/root/repo/tools")
    from bench_streaming import write_landing

    spark = get_spark(
        app_name=f"binpack-gate-{strategy}",
        extra_conf={
            "spark.sql.streaming.numRecentProgressUpdates": str(
                n_batches + 10
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    now_epoch = int(
        dt.datetime.strptime(NOW_ANCHOR, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )

    work = tempfile.mkdtemp(prefix=f"binpack_gate_{strategy}_")
    landing = os.path.join(work, "landing")
    n_events = write_landing(spark, SF_DIR, landing, 64 * n_batches)

    # 14 all-live days, expiring now+1d .. now+14d; the max day is the one
    # this drain's own claims land in (expiresAt = now + 14d), i.e. the
    # OPEN day bin-pack correctly skips. Keys disjoint from the events'.
    n_ledger = rows_per_day * N_DAYS
    seed = spark.range(n_ledger).select(
        F.concat(F.lit("seed-"), F.col("id")).alias("pk"),
        F.timestamp_seconds(F.lit(now_epoch - 7 * DAY)).alias("seenAt"),
        (
            F.lit(now_epoch)
            + (F.col("id") % N_DAYS + 1) * DAY
            + (F.col("id") % 3600)
        ).alias("expiresAt"),
        F.lit("seed").alias("writer_id"),
    ).withColumn("expiryDay", sinks.expiry_day_col())
    ledger = os.path.join(work, "ledger")
    parts = files_per_day if strategy in ("accreted", "binpacked") else 1
    # repartition(N) spreads each day's rows over N tasks -> N files per
    # day dir; repartition(1, day) would serialize the whole seed write.
    writer = (
        seed.repartition(parts)
        if parts > 1
        else seed.repartition(F.col("expiryDay"))
    )
    writer.write.partitionBy("expiryDay").parquet(ledger)
    sinks.mark_ledger_partitioned(ledger)

    binpack_wall = None
    if strategy == "binpacked":
        t_pack = time.perf_counter()
        packed = sinks.binpack_ledger_closed_days(
            spark, ledger, now_epoch=now_epoch, min_files=8
        )
        binpack_wall = round(time.perf_counter() - t_pack, 1)
        assert len(packed) == N_DAYS - 1, packed  # all but the open day

    total_files = sum(
        1
        for d in os.listdir(ledger)
        if d.startswith("expiryDay=")
        for f in os.listdir(os.path.join(ledger, d))
        if f.endswith(".parquet")
    )

    out = os.path.join(work, "out")
    t0 = time.perf_counter()
    stream = envelopes_to_webhook_shape(read_envelope_stream(spark, landing))
    q = start_ledger_gated_fact_sink(
        normalize_webhooks(stream),
        ledger,
        out,
        os.path.join(work, "ckpt"),
        available_now=True,
        now_epoch=now_epoch,
        partition_by_expiry=True,
    )
    q.awaitTermination(3600)
    wall = time.perf_counter() - t0

    raw = [
        x if isinstance(x, dict) else json.loads(x) for x in q.recentProgress
    ]
    ms = sorted(
        (p["batchId"], p["durationMs"]["triggerExecution"])
        for p in raw
        if p.get("numInputRows", 0) > 0
    )
    facts = spark.read.parquet(out).count()
    print(
        json.dumps(
            {
                "strategy": strategy,
                "wall_sec": round(wall, 2),
                "binpack_wall_sec": binpack_wall,
                "ledger_files_at_drain": total_files,
                "events_in": n_events,
                "facts_out": facts,
                "batch_ms": [d for _, d in ms],
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        run_cell(
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
        )
        return
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else ROWS_PER_DAY_DEFAULT
    files = int(sys.argv[2]) if len(sys.argv) > 2 else FILES_PER_DAY_DEFAULT
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else N_BATCHES_DEFAULT

    order = [
        ("accreted", 1),
        ("packed", 1),
        ("binpacked", 1),
        ("packed", 2),
        ("accreted", 2),
    ]
    cells: dict[str, dict] = {}
    for idx, (strategy, rnd) in enumerate(order):
        print(f"=== cell {idx}: {strategy} round {rnd} ===", file=sys.stderr)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--cell",
                strategy,
                str(rows),
                str(files),
                str(n_batches),
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
                "error": (proc.stderr.strip().splitlines() or ["?"])[-1][-300:]
            }
            continue
        cells[key] = json.loads(proc.stdout.strip().splitlines()[-1])
        cells[key]["ordering"] = idx
        print(json.dumps(cells[key]), file=sys.stderr)

    vals = {c["facts_out"] for c in cells.values() if "facts_out" in c}
    assert len(vals) <= 1, f"cells disagree on facts_out: {cells}"

    summary: dict = {}
    for strategy in ("accreted", "packed", "binpacked"):
        walls = [
            c["wall_sec"]
            for k, c in cells.items()
            if k.startswith(strategy) and "wall_sec" in c
        ]
        if walls:
            summary[f"{strategy}_min_sec"] = min(walls)
            summary[f"{strategy}_walls"] = walls
            summary[f"{strategy}_ambient_suspect"] = ambient_suspect(walls)
    if "accreted_min_sec" in summary and "packed_min_sec" in summary:
        summary["speedup_packed_over_accreted"] = round(
            summary["accreted_min_sec"] / summary["packed_min_sec"], 2
        )
    if "accreted_min_sec" in summary and "binpacked_min_sec" in summary:
        summary["speedup_binpacked_over_accreted"] = round(
            summary["accreted_min_sec"] / summary["binpacked_min_sec"], 2
        )

    ladder_path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(ladder_path)) if os.path.exists(ladder_path) else {}
    key = f"rows{rows // 1000}k_files{files}_b{n_batches}"
    data.setdefault("ledger_binpack_gate", {})[key] = {
        "cells": cells,
        "summary": summary,
        "n_days": N_DAYS,
        "note": (
            "Directive r13-2 fix A/B: 8-batch sf0.1 drain against a "
            f"14-day all-live partitioned ledger — accreted ({files} "
            "files/day, the 1-min-trigger steady state) vs packed (1 "
            "file/day) vs accreted-then-binpack_ledger_closed_days (the "
            "shipped fix; pack wall reported, open day correctly left "
            "accreted). Identical rows everywhere (estimate above the "
            "broadcast threshold -> healthy SMJ gate in all cells); "
            "facts_out asserted equal. One fresh JVM per cell, "
            "alternated order, min-of-2 on accreted/packed."
        ),
    }
    json.dump(data, open(ladder_path, "w"), indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
