"""Weak-scaling probe: REAL separate-JVM executors via local-cluster mode.

Every prior ladder cell ran one JVM (`local[N]`), so the claim that closes the
pair-trunk story — "production relieves the spill by scaling executors WITH
data, holding the per-task slice constant" — was only ever tested by inversion
(local[8] same-heap → spill collapses). Spark's `local-cluster[n,cores,mem]`
test master launches n REAL executor JVMs as separate processes with real
inter-process shuffle, which lets the claim be measured directly on this box:

- **weak-scaling pair**: sf10 on ONE 8-core/14g executor vs sf30 (3x the
  data) on THREE identical executors. If per-executor-slice is what governs,
  the two cells see the same per-executor load: wall-clock stays ~flat and
  per-executor spill stays ~equal while the data tripled.
- **strong-scaling control**: sf30 on the SAME single executor — 3x data, no
  extra hardware. This is the cell the claim says production never runs; its
  spill and wall should blow up ~superlinearly vs the sf10 baseline.

Each cell runs in a fresh subprocess (one JVM generation per measurement) and
reads per-stage ``memoryBytesSpilled``/``diskBytesSpilled`` plus per-executor
GC off the UI REST status API, exactly like tools/probe_pair_trunk.py.
Results merge into ``SCALE_LADDER.json["weak_scaling_probe"][<query>]``.

Usage:
    python tools/probe_weak_scaling.py [ladder_root]
    python tools/probe_weak_scaling.py --query dedup_minhash_lsh [ladder_root]
    # child mode (internal): --cell <master> <sf_dir> <query>
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

QUERY = "dedup_ngram_jaccard"

# One executor "shape" used for every cell: 8 cores / 16 GiB worker with a
# 14 GiB executor heap (2 GiB worker headroom). Scaling out = more of these.
EXEC_CORES = 8
WORKER_MB = 16384
EXEC_MEM = "14g"


def _master(n_execs: int) -> str:
    return f"local-cluster[{n_execs},{EXEC_CORES},{WORKER_MB}]"


def run_cell(master: str, sf_dir: str, query: str = QUERY) -> None:
    """Child: one (master, rung) measurement in a fresh JVM tree; prints ONE
    JSON line on stdout (everything else goes to stderr)."""
    from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
    from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES
    from quill_agent_dashboard_pbi_etl_spark.session import get_spark

    # local-cluster needs SPARK_HOME to spawn worker/executor JVMs; the pip
    # install ships the launch scripts inside the package dir.
    import pyspark

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))

    spark = get_spark(
        app_name=f"weak-scaling-{master}",
        master=master,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4051",
            "spark.executor.memory": EXEC_MEM,
            # NOT merely a coordinator: under AQE broadcast conversion the
            # DRIVER collects and builds every broadcast relation. At 8g the
            # sf30 cells died in notEnoughMemoryToBuildAndBroadcastTableError
            # while all executors were healthy — the inverted-index join side
            # sits under the 64 MB threshold serialized but not in driver
            # build form. 16g fits it; executor memory still dominates cells.
            "spark.driver.memory": "16g",
            # Three executors spilling tens of GB to one local disk can
            # stall RPC threads past the 120s default; ride out writeback
            # storms instead of declaring executors dead mid-spill.
            "spark.network.timeout": "600s",
            "spark.executor.heartbeatInterval": "60s",
            # If executors genuinely cannot start, fail the app after a few
            # tries — the default standalone behavior relaunched 1,546
            # executors in 60s before giving up (measured).
            "spark.deploy.maxExecutorRetries": "3",
        },
    )
    # WARN, not ERROR: in local-cluster mode the standalone Master/Worker log
    # through the driver's log4j, and executor exit statuses are the only
    # diagnosable trace of a crash loop. WEAK_PROBE_LOG=INFO for a post-mortem
    # rerun — the master states WHY it replaced an executor only at INFO.
    spark.sparkContext.setLogLevel(os.environ.get("WEAK_PROBE_LOG", "WARN"))
    t0 = time.perf_counter()
    QUERIES[query](spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/executors"
    ) as r:
        execs = json.load(r)

    workers = [e for e in execs if e["id"] != "driver"]
    total_mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    total_disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    gc_ms = sum(e.get("totalGCTime", 0) for e in workers)
    task_ms = sum(e.get("totalDuration", 0) for e in workers)
    out = {
        "master": master,
        "n_executors": len(workers),
        "executor_shape": f"{EXEC_CORES}c/{EXEC_MEM}",
        "sf_dir": sf_dir,
        "wall_sec": round(wall, 1),
        "memory_spill_gb": round(total_mem / 2**30, 2),
        "disk_spill_gb": round(total_disk / 2**30, 2),
        "memory_spill_gb_per_executor": round(total_mem / 2**30 / max(1, len(workers)), 2),
        "shuffle_write_gb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 2**30, 2
        ),
        "gc_time_sec": round(gc_ms / 1000, 1),
        "gc_fraction": round(gc_ms / task_ms, 3) if task_ms else None,
    }
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2], sys.argv[3], sys.argv[4] if len(sys.argv) > 4 else QUERY)
        return

    argv = sys.argv[1:]
    query = QUERY
    if "--query" in argv:
        i = argv.index("--query")
        query = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    cell_filter = None
    if "--cells" in argv:
        i = argv.index("--cells")
        cell_filter = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    ladder_root = argv[0] if argv else "/root/repo/scale_ladder"

    # Start from any previously recorded cells so a single-cell rerun
    # (--cells) refines rather than discards the rest.
    path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    cells = dict(
        data.get("weak_scaling_probe", {}).get(query, {}).get("cells", {})
    )

    plan = [
        ("baseline_sf10_1exec", "sf10", _master(1)),
        ("weak_scaled_sf30_3exec", "sf30", _master(3)),
        ("control_sf30_1exec", "sf30", _master(1)),
    ]
    for label, rung, master in plan:
        if cell_filter is not None and label not in cell_filter:
            continue
        sf_dir = os.path.join(ladder_root, rung)
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        print(f"=== {label}: {master} @ {rung} ===", file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell", master, sf_dir, query],
                capture_output=True,
                text=True,
                env=dict(os.environ),
                timeout=7200,
            )
        except subprocess.TimeoutExpired:
            cells[label] = {"error": "timeout after 7200s", "rung": rung}
            _write(path, query, cells, _summary(cells))
            continue
        if proc.returncode != 0:
            # keep going: a dead cell must not discard the measured ones.
            print(proc.stderr[-3000:], file=sys.stderr)
            cells[label] = {
                "error": proc.stderr.strip().splitlines()[-1][-300:]
                if proc.stderr.strip()
                else f"exit {proc.returncode}",
                "rung": rung,
            }
            _write(path, query, cells, _summary(cells))
            continue
        # A zero-exit child with empty/non-JSON stdout (e.g. killed between
        # print and flush, or a stray stdout write from a library) must be
        # recorded like any other dead cell, not abort the remaining plan.
        try:
            cell = json.loads(proc.stdout.strip().splitlines()[-1])
        except (IndexError, json.JSONDecodeError) as exc:
            print(proc.stderr[-3000:], file=sys.stderr)
            cells[label] = {
                "error": f"unparseable child stdout ({exc}): "
                f"{proc.stdout.strip()[-200:]!r}",
                "rung": rung,
            }
            _write(path, query, cells, _summary(cells))
            continue
        cell["rung"] = rung
        cells[label] = cell
        print(json.dumps(cell, indent=1), file=sys.stderr)
        _write(path, query, cells, _summary(cells))  # survive a mid-plan kill

    print(json.dumps(_summary(cells)))


def _summary(cells: dict) -> dict:
    summary = {}
    base = cells.get("baseline_sf10_1exec")
    weak = cells.get("weak_scaled_sf30_3exec")
    ctrl = cells.get("control_sf30_1exec")
    base = None if base and "error" in base else base
    weak = None if weak and "error" in weak else weak
    ctrl = None if ctrl and "error" in ctrl else ctrl
    if base and weak:
        # 1.0 = perfect weak scaling (3x data on 3x executors costs the same
        # wall-clock as 1x on 1x). local-cluster shuffles over loopback TCP,
        # so anything near 1 on a REAL cluster fabric is the claim confirmed.
        summary["weak_scaling_wall_ratio"] = round(weak["wall_sec"] / base["wall_sec"], 2)
        summary["spill_per_executor_ratio"] = (
            round(
                weak["memory_spill_gb_per_executor"]
                / base["memory_spill_gb_per_executor"],
                2,
            )
            if base["memory_spill_gb_per_executor"]
            else None
        )
    if base and ctrl:
        summary["strong_control_wall_exponent"] = round(
            math.log(ctrl["wall_sec"] / base["wall_sec"]) / math.log(3.0), 2
        )
        summary["strong_control_spill_growth"] = (
            round(ctrl["memory_spill_gb"] / base["memory_spill_gb"], 1)
            if base["memory_spill_gb"]
            else None
        )
    return summary


def _write(path: str, query: str, cells: dict, summary: dict) -> None:
    data = json.load(open(path)) if os.path.exists(path) else {}
    # MERGE the freshly computed summary over the stored one rather than
    # replacing it: partial reruns (--cells) must not drop extra summary
    # fields recorded earlier (e.g. the hand-annotated control_outcome).
    stored = dict(
        data.get("weak_scaling_probe", {}).get(query, {}).get("summary", {})
    )
    stored.update(summary)
    data.setdefault("weak_scaling_probe", {})[query] = {
        "note": (
            "REAL separate-JVM executors (local-cluster master): weak-scaling "
            "pair holds per-executor slice constant as data grows 3x; the "
            "control cell is the same 3x data denied the extra executors."
        ),
        "cells": cells,
        "summary": stored,
    }
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
