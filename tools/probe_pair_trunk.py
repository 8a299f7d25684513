"""Instrument the sf30 exact-Jaccard pair-trunk mechanism (round-8 directive).

Round 7 measured the trunk (dedup_ngram_jaccard: shingle → inverted index →
pair verify) going super-linear at sf30 (p ≈ 1.9 single-JVM) and REFUTED four
candidate mitigations, leaving "fixed per-task memory vs 3×-per-decade
partition volume (external agg/sort spill passes)" as the surviving
explanation — but survivorship-argued, never instrumented. This tool measures
it directly:

1. **Spill counters**: run the query with the Spark UI's REST status API
   enabled and read per-stage ``memoryBytesSpilled`` / ``diskBytesSpilled`` /
   ``shuffleWriteBytes`` — if the super-linearity is external-pass spill, the
   sf10→sf30 spill bytes must grow far faster than 3×.
2. **The local[8] counterfactual**: production "relieves the trunk by scaling
   executors WITH data", which a one-box ladder cannot emulate — but the box
   CAN emulate its inverse: local[8] at the same 64g heap gives each task ~4×
   the memory of local[32] (and 4× fewer concurrent tasks). If per-task
   memory is the mechanism, the local[8] cells spill far less and the
   sf10→sf30 exponent drops toward linear even though absolute wall-clock
   rises on 4× fewer cores.

Each (master, rung) cell runs in a FRESH subprocess/JVM (heap state from a
prior cell must not bleed into the next). Results merge into
``SCALE_LADDER.json["sf30_pair_trunk_probe"]["spill_instrumentation"]``.

Usage:
    SPARK_GRAFT_DRIVER_MEM=64g python tools/probe_pair_trunk.py [ladder_root]
    # any other wide-trunk query (results land under
    # SCALE_LADDER.json["spill_probes"][<query>] instead):
    python tools/probe_pair_trunk.py --query dedup_minhash_lsh [ladder_root]
    # child mode (internal): probe_pair_trunk.py --cell <master> <sf_dir> <query>
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


def run_cell(master: str, sf_dir: str, query: str = QUERY) -> None:
    """Child: one (master, rung) measurement in a fresh JVM; prints ONE JSON
    line on stdout (everything else goes to stderr)."""
    from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
    from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES
    from quill_agent_dashboard_pbi_etl_spark.session import get_spark

    spark = get_spark(
        app_name=f"pair-trunk-probe-{master}",
        master=master,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    QUERIES[query](spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl  # e.g. http://host:4049
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)

    total_mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    total_disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    total_shuffle_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    # GC share distinguishes heap-contention super-linearity from spill:
    # zero spill + exploding GC fraction = the hash-agg working set is
    # thrashing the collector, not the external sorter.
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/executors"
    ) as r:
        execs = json.load(r)
    gc_ms = sum(e.get("totalGCTime", 0) for e in execs)
    task_ms = sum(e.get("totalDuration", 0) for e in execs)
    spillers = sorted(
        (
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:80],
                "num_tasks": s.get("numTasks"),
                "memory_spill_mb": round(s.get("memoryBytesSpilled", 0) / 2**20, 1),
                "disk_spill_mb": round(s.get("diskBytesSpilled", 0) / 2**20, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 1),
                "executor_run_ms": s.get("executorRunTime"),
            }
            for s in stages
        ),
        key=lambda d: -(d["memory_spill_mb"] + d["disk_spill_mb"]),
    )
    out = {
        "master": master,
        "sf_dir": sf_dir,
        "wall_sec": round(wall, 1),
        "n_stages": len(stages),
        "memory_spill_gb": round(total_mem / 2**30, 2),
        "disk_spill_gb": round(total_disk / 2**30, 2),
        "shuffle_write_gb": round(total_shuffle_w / 2**30, 2),
        "gc_time_sec": round(gc_ms / 1000, 1),
        "task_time_sec": round(task_ms / 1000, 1),
        "gc_fraction": round(gc_ms / task_ms, 3) if task_ms else None,
        "top_spill_stages": [d for d in spillers[:4] if d["memory_spill_mb"] or d["disk_spill_mb"]],
    }
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        run_cell(
            sys.argv[2],
            sys.argv[3],
            sys.argv[4] if len(sys.argv) > 4 else QUERY,
        )
        return

    argv = sys.argv[1:]
    query = QUERY
    if "--query" in argv:
        i = argv.index("--query")
        query = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    ladder_root = argv[0] if argv else "/root/repo/scale_ladder"
    cells = []
    for master in ("local[32]", "local[8]"):
        for rung in ("sf10", "sf30"):
            sf_dir = os.path.join(ladder_root, rung)
            if not os.path.isdir(sf_dir):
                print(f"skip {rung}: {sf_dir} missing", file=sys.stderr)
                continue
            print(f"=== {master} @ {rung} ===", file=sys.stderr)
            env = dict(os.environ)
            env.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell", master, sf_dir, query],
                capture_output=True,
                text=True,
                env=env,
                timeout=3600,
            )
            if proc.returncode != 0:
                print(proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"cell {master}@{rung} failed")
            cell = json.loads(proc.stdout.strip().splitlines()[-1])
            cell["rung"] = rung
            cells.append(cell)
            print(json.dumps(cell, indent=1), file=sys.stderr)

    # sf10→sf30 exponents per master (3× docs per decade step)
    exponents = {}
    for master in ("local[32]", "local[8]"):
        ts = {c["rung"]: c["wall_sec"] for c in cells if c["master"] == master}
        if "sf10" in ts and "sf30" in ts:
            exponents[master] = round(math.log(ts["sf30"] / ts["sf10"]) / math.log(3.0), 2)

    path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    payload = {
        "query": query,
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"),
        "cells": cells,
        "exponents_sf10_to_sf30": exponents,
    }
    if query == QUERY:
        data.setdefault("sf30_pair_trunk_probe", {})[
            "spill_instrumentation"
        ] = payload
    else:
        data.setdefault("spill_probes", {})[query] = payload
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"exponents": exponents, "cells": len(cells)}))


if __name__ == "__main__":
    main()
