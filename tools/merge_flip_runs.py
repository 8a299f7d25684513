"""Merge two flip-sweep passes (normal + FLIP_ORDER=reversed within-cell
order) into min-of-2 cells with both runs preserved.

Usage: python tools/merge_flip_runs.py /tmp/flip_run1.json
  (run 2's cells are read from the live SCALE_LADDER.json, which the second
  sweep just overwrote; run 1's from the snapshot taken before it started.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_common import ambient_suspect  # noqa: E402

run1_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flip_run1.json"
LADDER = "/root/repo/SCALE_LADDER.json"

run1 = json.load(open(run1_path))["streaming_ledger_gate"]["flip_point"]
data = json.load(open(LADDER))
run2 = data["streaming_ledger_gate"]["flip_point"]

merged: dict = {}
for key in sorted(set(run1) & set(run2)):
    c1, c2 = run1[key], run2[key]
    cell = {
        k: c1[k]
        for k in ("events_per_batch", "live_keys", "expected_survivors", "micro_batches")
    }
    for strat in ("exact", "bloom_pregate"):
        walls = [c1[strat]["wall_sec"], c2[strat]["wall_sec"]]
        cell[strat] = {
            "wall_sec": min(walls),
            "walls": walls,  # [run1 exact-first, run2 bloom-first]
            "events_per_sec": int(cell["events_per_batch"] / min(walls)),
            # third-run falsification rule (probe_common): >1.5x self-
            # disagreement = ambient contamination; a third pass is
            # required before any rule cites this strategy's wall.
            "ambient_suspect": ambient_suspect(walls),
        }
    cell["pregate_vs_exact_ratio"] = round(
        cell["bloom_pregate"]["wall_sec"] / cell["exact"]["wall_sec"], 3
    )
    cell["ambient_suspect"] = any(
        cell[s]["ambient_suspect"] for s in ("exact", "bloom_pregate")
    )
    merged[key] = cell

node = data["streaming_ledger_gate"]["flip_point"] = merged
data["streaming_ledger_gate"]["flip_point_note"] = (
    "min-of-2 across two full sweep passes with ALTERNATED within-cell "
    "strategy order (pass 1 exact-first, pass 2 bloom-first; walls list "
    "preserves both), single availableNow micro-batch per cell, survivors "
    "asserted equal to the batch gate in every cell of both passes."
)
json.dump(data, open(LADDER, "w"), indent=1)
for k, v in merged.items():
    print(
        f"{k}: ev={v['events_per_batch']} live={v['live_keys']} "
        f"exact={v['exact']['walls']} pre={v['bloom_pregate']['walls']} "
        f"ratio(min)={v['pregate_vs_exact_ratio']}"
    )
