"""Verify ledger_gate_bloom's probe="auto" picks the measured-better probe
encoding at both volume extremes.

The r9 rule was applied only where callers hardcoded probe="bucketed": tens
of millions of probed events → the literal probe's per-row conv(hex(substr))
CPU loses to the codegen'd word-table hash-join (31–79 s vs 9.9 s at sf100);
few events → the literal's zero-join setup wins. Round 10 made "auto"
dispatch on Catalyst's job-free input-size estimate
(dedup.AUTO_BUCKETED_PROBE_BYTES). This probe prices all three settings at
the two extremes and records WHICH encoding auto chose, so "auto matches the
better shape" is a measurement, not the threshold's docstring.

Per rung (sf1 = small extreme, sf100 = large): pin fact + ledger, size the
filter at 1% fpp from the live count, then time the full gate with
probe="literal", probe="bucketed", probe="auto", survivors asserted equal.
auto's choice is recorded from the same estimate the operator reads.

Results → SCALE_LADDER.json["bloom_probe_auto"].

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/probe_auto_dispatch.py [ladder_root]
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


def main() -> None:
    ladder_root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_ladder"
    now_epoch = int(
        dt.datetime.strptime(NOW_ANCHOR, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )
    spark = get_spark(app_name="probe-auto-dispatch")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for rung in ("sf1", "sf100"):
        sf_dir = os.path.join(ladder_root, rung)
        if not os.path.isdir(sf_dir):
            print(f"skip {rung}: missing", file=sys.stderr)
            continue
        # The volume signal must see what a caller's events side looks like:
        # the parquet-backed scan BEFORE the pin (pinned RDDs carry no file
        # statistics). Estimate read on the unpinned plan, gate timed on the
        # pinned fact — matching how the streaming sink meets the operator
        # (file-source micro-batch, then pinned).
        raw_fact = normalized_fact(spark, sf_dir).withColumnRenamed(
            "EventID", "dedup_key"
        )
        est = dedup.probe_volume_estimate(raw_fact)
        fact = pin(raw_fact, required=True)
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
        live_n = ledger.filter(F.col("expiresAt") >= F.lit(now_epoch)).count()
        num_bits = max(1 << 16, int(1.44 * live_n * math.log2(1 / 0.01)))
        auto_choice = (
            "bucketed"
            if ((num_bits + 63) // 64) * 64 > dedup.MAX_BLOOM_LITERAL_BITS
            or (est is not None and est > dedup.AUTO_BUCKETED_PROBE_BYTES)
            else "literal"
        )

        cell: dict = {
            "events": fact.count(),
            "live_keys": live_n,
            "bloom_mbits": round(num_bits / 1e6, 1),
            "estimated_probe_bytes": est,
            "auto_threshold_bytes": dedup.AUTO_BUCKETED_PROBE_BYTES,
            "auto_choice": auto_choice,
        }
        survivors = set()
        # The timed gates use the UNPINNED fact for auto (so the operator
        # reads the same file-scan estimate recorded above) and for the
        # forced settings (identical input plan = identical scan cost — the
        # pin above only warms the page cache equally for all three).
        for setting in ("literal", "bucketed", "auto"):
            t0 = time.perf_counter()
            gated = dedup.ledger_gate_bloom(
                raw_fact,
                ledger,
                key_col="dedup_key",
                now_epoch=now_epoch,
                num_bits=num_bits,
                probe=setting,
            )
            _noop(gated)
            cell[f"{setting}_sec"] = round(time.perf_counter() - t0, 3)
            survivors.add(gated.count())
        assert len(survivors) == 1, (rung, survivors)
        cell["survivors"] = survivors.pop()
        better = "literal" if cell["literal_sec"] <= cell["bucketed_sec"] else "bucketed"
        cell["measured_better"] = better
        cell["auto_matches_better"] = auto_choice == better
        out[rung] = cell
        print(f"{rung}: {json.dumps(cell)}", flush=True)

    path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.setdefault("bloom_probe_auto", {}).update(out)
    data["bloom_probe_auto"]["note"] = (
        "ledger_gate_bloom probe=literal/bucketed/auto priced at both volume "
        "extremes on pinned inputs, same-process sequential cells; "
        "auto_choice recorded from the operator's own Catalyst input-size "
        "estimate."
    )
    json.dump(data, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
