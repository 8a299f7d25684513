"""Measurement-discipline helpers shared by the probe_*/bench_* tools.

The third-run falsification rule, made mechanical. Round-10 lesson: the
streaming flip grid's single positive cell (0.60x at 60M events / 5.8M
keys) died on a third fresh-process run — BOTH earlier passes had been
catching ambient JVM/page-cache degradation, and the save only happened
because the builder chose to re-run it. One-box ambient noise on ~100 s
cells reaches 2-3x; the observed signature of a contaminated min-of-N
pair is its walls disagreeing by more than ``AMBIENT_WALL_RATIO``. A cell
carrying ``ambient_suspect=true`` needs a third pass before any rule may
cite it (RUNBOOK.md "Measurement discipline").

Retro-annotation of the committed ladder (idempotent):

    python tools/probe_common.py --annotate-ladder

walks SCALE_LADDER.json, flags every node carrying a multi-run ``walls``
list and every summary carrying ``<setting>_walls`` keys, and prints the
flagged paths. Validation: at 1.5x the retro-flags land on exactly the
cells the round-10 narrative identified as ambient-degraded (the
flip_point vol30/vol60 pairs whose second drain inherited a degraded JVM,
and flip_point_auto's exact pair) and on none of the fresh-JVM
alternated-order cells (sf300_ab, bloom_probe_auto).
"""

from __future__ import annotations

import json
import sys

AMBIENT_WALL_RATIO = 1.5

LADDER = "/root/repo/SCALE_LADDER.json"


def ambient_suspect(walls) -> bool:
    """True when repeated measurements of the SAME cell disagree by more
    than ``AMBIENT_WALL_RATIO`` — the observed one-box ambient-degradation
    signature. Fewer than two numeric walls can't be judged -> False."""
    ws = [w for w in walls if isinstance(w, (int, float)) and w > 0]
    if len(ws) < 2:
        return False
    return max(ws) / min(ws) > AMBIENT_WALL_RATIO


def annotate_ladder(path: str = LADDER) -> list[str]:
    """Retro-apply the flag to every persisted min-of-N wall pair: nodes
    with a ``walls`` list get ``ambient_suspect``; summary dicts with
    ``<name>_walls`` keys get ``<name>_ambient_suspect``. Returns the
    flagged paths. Idempotent (re-running recomputes the same flags)."""
    data = json.load(open(path))
    flagged: list[str] = []

    def walk(node, trail: str) -> None:
        if not isinstance(node, dict):
            return
        if isinstance(node.get("walls"), list):
            node["ambient_suspect"] = ambient_suspect(node["walls"])
            if node["ambient_suspect"]:
                flagged.append(trail)
        for key in [k for k in node if k.endswith("_walls")]:
            if isinstance(node[key], list):
                name = key.removesuffix("_walls")
                node[f"{name}_ambient_suspect"] = ambient_suspect(node[key])
                if node[f"{name}_ambient_suspect"]:
                    flagged.append(f"{trail}.{name}")
        for k, v in node.items():
            walk(v, f"{trail}.{k}")

    walk(data, "")
    data["ambient_flag_note"] = (
        f"ambient_suspect=true marks a min-of-N cell whose own walls "
        f"disagree >{AMBIENT_WALL_RATIO}x — the one-box ambient-degradation "
        "signature (the mechanism that manufactured, then killed, the r10 "
        "flip grid's only positive cell). Such a cell needs a third "
        "fresh-process pass before any rule may cite it; probe_* tools now "
        "emit the flag at measurement time."
    )
    json.dump(data, open(path, "w"), indent=1)
    return flagged


if __name__ == "__main__":
    if "--annotate-ladder" in sys.argv:
        for p in annotate_ladder():
            print(f"ambient_suspect: {p}")
    else:
        sys.exit(__doc__)
