"""Star-schema assembly: dimension builders, upserts, and D5 joins
(SURVEY.md §2.4 D5, §2.6 C1-C5).

All dims in this model are broadcast-sized (DimMetric = 4 rows, roster = one
ring group, DimDate ≈ 4k rows); every fact→dim join is an explicit broadcast
hash join so the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..schemas import DIM_METRIC_SCHEMA

# Goal benchmarks from docs/quill_dashboard_schema_design_doc.md:131-132
# (~50 calls + ~45 texts per agent per day); EMAILS/CASES goals are the
# engine's defaults (reference leaves them unspecified).
DEFAULT_METRIC_ROWS = [
    ("CALLS", "Outbound Calls", 50, 0.85),
    ("TEXTS", "Outbound Texts", 45, 0.85),
    ("EMAILS", "Emails Sent", 20, 0.85),
    ("CASES", "Cases Created", 5, 0.85),
]


def build_dim_metric(spark: SparkSession) -> DataFrame:
    """C3 DimMetric: 4-row static dim (src/domain/types.ts:10, goals
    tools/pbi/create-dataset.ts:76-77). Built as a LocalRelation
    (materialize.local_frame) — the plain list path parallelizes into 32
    Python-RDD slices, so every query broadcasting this dim paid a 32-task
    Python-worker stage (r14 measurement)."""
    from .materialize import local_frame

    return local_frame(spark, DEFAULT_METRIC_ROWS, DIM_METRIC_SCHEMA)


def sync_dim_agent(
    roster: DataFrame | None, dry_run: bool = False
) -> tuple[DataFrame | None, dict]:
    """C1 DimAgent clear-and-replace sync (dimagent.sync.service.ts:88-142).

    Contract (tests/dimagent-sync.test.ts): fetch → (dry-run stops here) →
    clear → push only if roster non-empty. The reference's delete-then-insert
    window is replaced by an atomic ``overwrite`` write — same capability,
    strictly safer. Returns (df_to_write_or_None, result_counters).
    """
    if roster is None:
        raise ValueError("roster fetch failed")  # reference propagates the error
    n = roster.count()
    if dry_run:
        return None, {"fetched": n, "cleared": False, "pushed": 0, "dryRun": True}
    if n == 0:
        # zero-row roster: clear the dim but skip the push (service.ts:133-136)
        return roster.limit(0), {"fetched": 0, "cleared": True, "pushed": 0, "dryRun": False}
    return roster, {"fetched": n, "cleared": True, "pushed": n, "dryRun": False}


def ensure_dims(dim: DataFrame, hint_keys: DataFrame, key: str) -> DataFrame:
    """C2 ensure-dims upsert-if-missing (ensure-dims.service.ts:4-11 spec):
    keys referenced by a batch but absent from the dim, as rows to append.
    Anti-join (hints are tiny → broadcast the DIM side is wrong; hints side
    broadcasts)."""
    return hint_keys.select(F.col(key)).distinct().join(
        dim.select(key), on=key, how="left_anti"
    )


def star_join(
    fact: DataFrame,
    dim_agent: DataFrame | None = None,
    dim_metric: DataFrame | None = None,
    dim_date: DataFrame | None = None,
    dim_shift: DataFrame | None = None,
) -> DataFrame:
    """D5 star-schema join (docs/quill_dashboard_schema_design_doc.md:27-35):
    Fact→DimAgent, Fact→DimMetric, Fact→DimDate (single-key M:1), and the
    composite (AgentID, LocalDate)→DimShift link. All broadcast."""
    out = fact
    if dim_agent is not None:
        out = out.join(broadcast(dim_agent), on="AgentID", how="left")
    if dim_metric is not None:
        out = out.join(broadcast(dim_metric), on="MetricID", how="left")
    if dim_date is not None:
        out = out.join(
            broadcast(dim_date),
            on=out["FactDateKey"] == dim_date["DateKey"],
            how="left",
        )
    if dim_shift is not None:
        out = out.join(
            broadcast(dim_shift),
            on=[
                out["AgentID"] == dim_shift["AgentID"],
                out["FactDateKey"] == F.date_format(dim_shift["LocalDate"], "yyyy-MM-dd"),
            ],
            how="left",
        )
    return out


def build_dim_shift(
    agents: DataFrame,
    dates: DataFrame,
    start_hour: int = 9,
    shift_hours: int = 8,
) -> DataFrame:
    """C5 DimShift expansion: one shift row per (agent, date) from rule
    parameters (docs/src_architecture_proposal.md:96-99). agents × dates is a
    deliberate small-dim cross join (broadcast), then timestamp arithmetic."""
    base = agents.select("AgentID").distinct().crossJoin(
        broadcast(dates.select(F.col("Date").alias("LocalDate")))
    )
    start = F.to_timestamp(
        F.concat(
            F.date_format("LocalDate", "yyyy-MM-dd"), F.lit(f" {start_hour:02d}:00:00")
        )
    )
    return base.select(
        "AgentID",
        "LocalDate",
        start.alias("ShiftStartLocal"),
        (start + F.expr(f"INTERVAL {shift_hours} HOURS")).alias("ShiftEndLocal"),
        F.lit(shift_hours).cast("long").alias("ShiftHours"),
    )
