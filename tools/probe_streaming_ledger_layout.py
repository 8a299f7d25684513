"""A/B the streaming claim sink's ledger LAYOUT: flat vs expiry-partitioned
(`start_ledger_gated_fact_sink(partition_by_expiry=True)`), against a
pre-seeded multi-million-key ledger.

Round 13 made the claim cycle layout-aware; the batch-side gate A/B
(tools/probe_ledger_gate_scan.py) showed the one-off gate is
join-dominated (partition pruning wall-neutral at ~50% expired). The
streaming regime differs in two ways worth measuring separately:

  * the ledger scan repeats EVERY trigger — an n-batch drain pays the
    scan n times, so a per-scan saving (or overhead) multiplies;
  * the partitioned layout adds per-trigger write overhead — each batch's
    claim append creates/extends an `expiryDay=` partition dir, and the
    read-back verify goes through partition discovery.

So the falsifiable claim runs both ways: if partition pruning matters in
the repeated-scan regime the partitioned drain wins; if the layout's
listing/append overhead dominates at streaming batch sizes it LOSES, and
that gets recorded (the RUNBOOK would then keep the flat default for
streaming and partitioned for batch lifecycle only).

Protocol: one FRESH JVM per cell, alternated order (flat,part,part,flat),
min-of-2, `ambient_suspect` at measurement time. Each child seeds its own
ledger (identical logical rows, ~half expired at the batch anchor so the
pruned side has something to prune), re-encodes the sf0.1 events table as
time-ordered envelope JSONL split for a multi-batch drain, and times ONE
full availableNow drain. Output fact counts and final ledger key counts
are asserted equal across layouts.

Results -> SCALE_LADDER.json["streaming_ledger_layout"].

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python tools/probe_streaming_ledger_layout.py \
        [n_ledger_rows] [n_batches]
    # child mode (internal): --cell <flat|part> <n_ledger_rows> <n_batches>
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

N_LEDGER_DEFAULT = 20_000_000
N_BATCHES_DEFAULT = 8
N_DAYS = 15  # uniform expiry spread; anchor mid-range -> ~half expired
DAY = 86_400
SF_DIR = "/root/testdata/sf0.1"


def run_cell(strategy: str, n_ledger: int, n_batches: int) -> None:
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

    spark = get_spark(app_name=f"stream-layout-ab-{strategy}")
    spark.sparkContext.setLogLevel("ERROR")
    now_epoch = int(
        dt.datetime.strptime(NOW_ANCHOR, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )

    work = tempfile.mkdtemp(prefix=f"stream_layout_{strategy}_")
    landing = os.path.join(work, "landing")
    # 64 files per trigger (read_envelope_stream's cap) -> n_batches batches
    n_events = write_landing(spark, SF_DIR, landing, 64 * n_batches)

    # Synthetic seed ledger: disjoint from the events' keys (the layout A/B
    # measures scan+join+append cost, which is duplicate-rate independent),
    # ~half the days expired at the anchor so pruning has real work.
    base = now_epoch - (N_DAYS // 2) * DAY
    seed = spark.range(n_ledger).select(
        F.concat(F.lit("seed-"), F.col("id")).alias("pk"),
        F.timestamp_seconds(F.lit(now_epoch - 14 * DAY)).alias("seenAt"),
        (F.lit(base) + (F.col("id") % N_DAYS) * DAY + (F.col("id") % DAY)).alias(
            "expiresAt"
        ),
        F.lit("seed").alias("writer_id"),
    )
    ledger = os.path.join(work, "ledger")
    sinks.append_ledger(seed, ledger, partition_by_expiry=(strategy == "part"))

    # Directive r13-4 instrumentation: record the flip-predicate inputs the
    # sink will see (live-ledger plan estimate vs broadcast threshold) and
    # COUNT how often the inverted gate shape actually fires during the
    # drain. At the r13 decade (20M keys) the pruned estimate landed under
    # the threshold and the narrowed condition fired; one decade up the
    # estimate sits ABOVE threshold, the predicate says the plain shape
    # stands, and the parent asserts the count is 0 there — falsifying the
    # narrowed auto-condition in the regime where it must NOT fire.
    from quill_agent_dashboard_pbi_etl_spark.operators import dedup as _dedup

    live_probe = sinks.read_ledger(spark, ledger, now_epoch=now_epoch).filter(
        F.col("expiresAt") >= F.lit(now_epoch)
    )
    live_est = _dedup.probe_volume_estimate(live_probe)
    thresh = _dedup.parse_spark_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    )
    inverted_calls = {"n": 0}
    _real_inverted = _dedup.anti_join_small_left

    def _counting_inverted(*a, **k):
        inverted_calls["n"] += 1
        return _real_inverted(*a, **k)

    _dedup.anti_join_small_left = _counting_inverted

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
        partition_by_expiry=(strategy == "part"),
    )
    q.awaitTermination(3600)
    wall = time.perf_counter() - t0

    facts = spark.read.parquet(out).count()
    keys = sinks.read_ledger(spark, ledger).count()
    if strategy == "part":
        assert any(
            d.startswith("expiryDay=") for d in os.listdir(ledger)
        ), "partitioned drain lost its layout"
    print(
        json.dumps(
            {
                "strategy": strategy,
                "wall_sec": round(wall, 3),
                "events_in": n_events,
                "facts_out": facts,
                "ledger_keys_after": keys,
                "events_per_sec": int(n_events / wall),
                "live_est_bytes": live_est,
                "broadcast_threshold": thresh,
                "inverted_gate_calls": inverted_calls["n"],
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    n_ledger = int(sys.argv[1]) if len(sys.argv) > 1 else N_LEDGER_DEFAULT
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else N_BATCHES_DEFAULT

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
                str(n_ledger),
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
                "error": (proc.stderr.strip().splitlines() or ["?"])[-1][-300:],
                "ordering": idx,
            }
            continue
        cell = json.loads(proc.stdout.strip().splitlines()[-1])
        cell["ordering"] = idx
        cells[key] = cell
        print(json.dumps(cell), file=sys.stderr)

    # Gate correctness is layout-invariant: same facts out, same final key
    # count, across every successful cell.
    for field in ("facts_out", "ledger_keys_after"):
        vals = {c[field] for c in cells.values() if field in c}
        assert len(vals) <= 1, f"layouts disagree on {field}: {cells}"

    # Directive r13-4: when the live estimate sits ABOVE the broadcast
    # threshold the flip regime cannot hold — the narrowed auto-condition
    # must NOT fire (the plain anti-join stands; a fire here would mean
    # the inverted shape runs in the regime where it measured 0.78×).
    for k, c in cells.items():
        est, thr = c.get("live_est_bytes"), c.get("broadcast_threshold")
        if est is not None and thr is not None and est > thr:
            assert c.get("inverted_gate_calls", 0) == 0, (
                f"cell {k}: inverted gate fired {c['inverted_gate_calls']}x "
                f"with live_est {est} > threshold {thr}: {cells}"
            )

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
    key = f"drain_n{n_ledger // 1_000_000}m_b{n_batches}"
    data.setdefault("streaming_ledger_layout", {})[key] = {
        "cells": cells,
        "summary": summary,
        "n_batches": n_batches,
        "n_days": N_DAYS,
        "sf_dir": SF_DIR,
        "note": (
            "Streaming claim sink, flat vs expiry-partitioned ledger: one "
            "fresh JVM per cell, alternated order, min-of-2; each child "
            f"seeds its own {N_DAYS}-day ledger (~half expired at the "
            "batch anchor) and times ONE availableNow drain of the sf0.1 "
            f"events re-encoded as envelope JSONL across {n_batches} "
            "micro-batches (the per-trigger ledger scan repeats per "
            "batch). facts_out and final key counts asserted equal "
            "across layouts."
        ),
    }
    json.dump(data, open(ladder_path, "w"), indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
