"""Measure the exact-vs-Bloom ledger-gate crossover on the scale ladder.

`ledger_gate_bloom`'s docstring predicts: below the broadcast threshold the
Bloom pre-gate is pure overhead (the tiny ledger broadcasts and the exact
anti-join is already cheap); once the TTL-live ledger outgrows broadcast,
the exact gate must shuffle EVERY event for the anti-join while the Bloom
path shuffles only the duplicate+fpp sliver. This tool measures both sides
of that claim on real rungs instead of arguing it.

Per rung: build the same synthetic prior-run ledger the registry queries use
(every event seen before 2024-01-10, 14-day TTL against the 2024-01-20
anchor), then time
  exact  — operators.dedup.ledger_gate (anti-join, planner's choice)
  bloom  — operators.dedup.ledger_gate_bloom with the bitmap sized to the
           live-key count at 1% fpp (num_bits ≈ 9.57·n, the formula in
           bloom_build's docstring), INCLUDING the live-count job and the
           bitmap build in its timing — production knows ledger cardinality
           from table metadata, but we charge the honest full price here.
Both outputs are counted and must match exactly (Bloom has no false
negatives; every maybe re-checks exactly).

Results merge into SCALE_LADDER.json under ledger_gate_exact/_bloom keys.

Usage: python tools/bench_ledger_gates.py [ladder_root] [rung ...]
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

RUNGS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf0.3": None,  # filled from ladder_root
    "sf1": None,
    "sf3": None,
    "sf10": None,
    "sf30": None,
    "sf100": None,
    "sf300": None,  # opt-in rung (make_scale_ladder.py --sf300): 17.5M live
    # keys -> 1% sizing 167 Mbits > MAX_BLOOM_LITERAL_BITS, so the PUBLIC
    # operator's beyond-guard dispatch is the only legal Bloom strategy.
}


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    argv = sys.argv[1:]
    ladder_root = argv[0] if argv else "/root/repo/scale_ladder"
    wanted = argv[1:] or list(RUNGS)
    now_epoch = int(
        dt.datetime.strptime(NOW_ANCHOR, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )
    spark = get_spark(app_name="bench-ledger-gates")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float | int]] = {}
    for rung in wanted:
        sf_dir = RUNGS.get(rung) or os.path.join(ladder_root, rung)
        if not os.path.isdir(sf_dir):
            continue
        fact = pin(
            normalized_fact(spark, sf_dir).withColumnRenamed(
                "EventID", "dedup_key"
            ),
            required=True,
        )
        ledger = fact.filter(
            F.col("EventTime") < F.lit("2024-01-10 00:00:00").cast("timestamp")
        ).select(
            F.col("dedup_key").alias("pk"),
            F.col("EventTime").alias("seenAt"),
            (F.unix_timestamp("EventTime") + 14 * 86400).alias("expiresAt"),
        )
        ledger = pin(ledger, required=True)  # a real prior-run table, not lineage

        res: dict[str, float | int] = {"events": fact.count()}
        t0 = time.perf_counter()
        exact = dedup.ledger_gate(
            fact, ledger, key_col="dedup_key", now_epoch=now_epoch
        )
        _noop(exact)
        res["exact_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        live_n = (
            ledger.filter(F.col("expiresAt") >= F.lit(now_epoch)).count()
        )  # charged to the bloom side: sizing needs the cardinality
        num_bits = max(1 << 16, int(1.44 * live_n * math.log2(1 / 0.01)))
        bloom = dedup.ledger_gate_bloom(
            fact, ledger, key_col="dedup_key", now_epoch=now_epoch,
            num_bits=num_bits,
        )
        _noop(bloom)
        res["bloom_sec"] = round(time.perf_counter() - t0, 3)
        res["live_keys"] = live_n
        res["bloom_mbits"] = round(num_bits / 1e6, 1)

        # Same sizing through the beyond-guard encoding (word table +
        # broadcast-join probes) — the path ledger_gate_bloom dispatches to
        # past MAX_BLOOM_LITERAL_BITS, forced here at every rung so the two
        # encodings price against each other on identical filters.
        t0 = time.perf_counter()
        live_keys = ledger.filter(
            F.col("expiresAt") >= F.lit(now_epoch)
        ).select(F.col("pk").alias("dedup_key"))
        words = dedup.bloom_words(live_keys, "dedup_key", num_bits)
        flagged = dedup.bloom_maybe_flag_bucketed(
            fact, words, num_bits, "dedup_key"
        )
        bucketed = flagged.filter(~F.col("__bloom_maybe")).drop(
            "__bloom_maybe"
        ).unionByName(
            flagged.filter(F.col("__bloom_maybe"))
            .drop("__bloom_maybe")
            .join(live_keys, on="dedup_key", how="left_anti")
        )
        _noop(bucketed)
        res["bloom_bucketed_sec"] = round(time.perf_counter() - t0, 3)

        n_exact, n_bloom = exact.count(), bloom.count()
        n_bucketed = bucketed.count()
        assert n_exact == n_bloom == n_bucketed, (
            rung, n_exact, n_bloom, n_bucketed,
        )
        res["survivors"] = n_exact

        # Where a tighter-fpp sizing genuinely crosses the literal guard,
        # run the PUBLIC operator at that sizing — the auto-dispatch
        # executing for real, not via a shrunken test guard.
        strict_bits = int(1.44 * live_n * math.log2(1 / 0.001))
        if strict_bits > dedup.MAX_BLOOM_LITERAL_BITS:
            t0 = time.perf_counter()
            beyond = dedup.ledger_gate_bloom(
                fact, ledger, key_col="dedup_key", now_epoch=now_epoch,
                num_bits=strict_bits,
            )
            _noop(beyond)
            res["bloom_beyond_guard_sec"] = round(time.perf_counter() - t0, 3)
            res["bloom_beyond_guard_mbits"] = round(strict_bits / 1e6, 1)
            assert beyond.count() == n_exact, (rung, "beyond-guard mismatch")

        # The metric the Bloom gate actually targets: rows entering the
        # anti-join (= shuffle volume once the ledger no longer broadcasts).
        # Exact gate: every event. Bloom gate: only the maybes
        # (true duplicates + fpp sliver). Local wall-clock barely moves at
        # these sizes because a few-million-row SMJ saturates neither memory
        # nor network on one box — the cut matters on network-bound
        # clusters, so record the volume itself.
        live_for_maybes = ledger.filter(
            F.col("expiresAt") >= F.lit(now_epoch)
        ).select(F.col("pk").alias("dedup_key"))
        if num_bits > dedup.MAX_BLOOM_LITERAL_BITS:
            # sf300+: the 1% sizing itself is past the plan-literal guard,
            # so the ONLY legal probe is the distributed word table — count
            # the maybes through it (identical filter, identical flags).
            flagged = dedup.bloom_maybe_flag_bucketed(
                fact,
                dedup.bloom_words(live_for_maybes, "dedup_key", num_bits),
                num_bits,
                "dedup_key",
            )
        else:
            flagged = dedup.bloom_maybe_flag(
                fact,
                dedup.bloom_build(live_for_maybes, "dedup_key", num_bits),
                "dedup_key",
            )
        maybes = flagged.filter(F.col("__bloom_maybe")).count()
        res["antijoin_rows_exact"] = res["events"]
        res["antijoin_rows_bloom"] = maybes

        # Beyond-broadcast regime, emulated: when the TTL-live ledger
        # outgrows the broadcast threshold the planner falls to a shuffle
        # join for the anti-join — disabling broadcast reproduces exactly
        # that plan on this rung's data. Both paths measured under the same
        # setting (the Bloom side's maybe-join demotes too, which is fair:
        # in that regime it also wouldn't broadcast).
        for key in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ):
            spark.conf.set(key, "-1")
        try:
            t0 = time.perf_counter()
            _noop(
                dedup.ledger_gate(
                    fact, ledger, key_col="dedup_key", now_epoch=now_epoch
                )
            )
            res["exact_sec_nobcast"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            _noop(
                dedup.ledger_gate_bloom(
                    fact, ledger, key_col="dedup_key", now_epoch=now_epoch,
                    num_bits=num_bits,
                )
            )
            res["bloom_sec_nobcast"] = round(time.perf_counter() - t0, 3)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

        out[rung] = res
        print(f"{rung}: {res}")

    path = "/root/repo/SCALE_LADDER.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.setdefault("ledger_gate_crossover", {}).update(out)
    json.dump(data, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
