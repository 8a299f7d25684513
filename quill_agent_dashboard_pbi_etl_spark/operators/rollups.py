"""Aggregation / analytic layer (SURVEY.md §2.5 A1-A8).

The reference keeps in-service aggregation minimal and delegates the dashboard
math to Power BI/DAX (docs/powerbi_etl_repo_design_v5.md:8,
docs/quill_dashboard_schema_design_doc.md:25). Here that analytic contract is
implemented natively: daily rollups, goal attainment, shift pace, color
classification, relative time filters, calendar generation.

Scale notes: A3 is a single hash aggregate (Spark does partial/map-side combine
automatically); A4/A5/A6 join only broadcast-sized dims; A7 folds to a
partition-prunable predicate on the date key; A8 generates the calendar
distributed via ``sequence``+``explode`` (no driver loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dim_hints(fact: DataFrame) -> DataFrame:
    """A1 dim-hints rebuild: the distinct FK values a batch references
    (orchestrator.ts:80-85). One aggregate, no per-key passes."""
    return fact.agg(
        F.sort_array(F.collect_set("AgentID")).alias("agentIds"),
        F.sort_array(F.collect_set("FactDateKey")).alias("dates"),
        F.sort_array(F.collect_set("MetricID")).alias("metrics"),
    )


def run_counters(processed: DataFrame, posted: DataFrame) -> DataFrame:
    """A2 run counters {processed, posted} (orchestrator.ts:87-89)."""
    return processed.agg(F.count("*").alias("processed")).crossJoin(
        posted.agg(F.count("*").alias("posted"))
    )


def daily_rollup(fact: DataFrame) -> DataFrame:
    """A3 FactDailyMetric: events per (agent, date, metric)
    (docs/powerbi_etl_repo_design_v5.md:8)."""
    return fact.groupBy("AgentID", "FactDateKey", "MetricID").agg(
        F.count("*").alias("EventCount")
    )


def goal_attainment(daily: DataFrame, dim_metric: DataFrame) -> DataFrame:
    """A4 goal attainment: count / DefaultGoal per agent/metric/day
    (docs/quill_dashboard_schema_design_doc.md:158-161). DimMetric is 4 rows →
    broadcast."""
    return daily.join(broadcast(dim_metric), "MetricID").select(
        "AgentID",
        "FactDateKey",
        "MetricID",
        "EventCount",
        F.col("DefaultGoal"),
        F.round(F.col("EventCount") / F.col("DefaultGoal"), 6).alias("GoalPct"),
    )


def shift_elapsed_pct(now_local: Column, start: Column, end: Column) -> Column:
    """A5 %ShiftElapsed: (now−start)/(end−start) clamped to [0,1]
    (docs/quill_dashboard_schema_design_doc.md:152-161)."""
    frac = (F.unix_timestamp(now_local) - F.unix_timestamp(start)) / (
        F.unix_timestamp(end) - F.unix_timestamp(start)
    )
    return F.round(F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)), 6)


def pace(
    attainment: DataFrame, dim_shift: DataFrame, now_local: Column
) -> DataFrame:
    """A5 shift pace: join DimShift on the composite (AgentID, LocalDate) key
    and compare goal attainment to shift progress."""
    joined = attainment.join(
        broadcast(dim_shift),
        on=[
            attainment["AgentID"] == dim_shift["AgentID"],
            attainment["FactDateKey"] == F.date_format(dim_shift["LocalDate"], "yyyy-MM-dd"),
        ],
        how="left",
    )
    return joined.select(
        attainment["AgentID"],
        "FactDateKey",
        "MetricID",
        "EventCount",
        "GoalPct",
        shift_elapsed_pct(
            now_local, F.col("ShiftStartLocal"), F.col("ShiftEndLocal")
        ).alias("ShiftElapsedPct"),
    )


def color_class(goal_pct: Column, elapsed_pct: Column, yellow_floor: Column) -> Column:
    """A6 color classification (docs/quill_dashboard_schema_design_doc.md:152-157):
    GREEN ≥ pace; YELLOW ≥ pace·floor; RED below."""
    return (
        F.when(goal_pct >= elapsed_pct, F.lit("GREEN"))
        .when(goal_pct >= elapsed_pct * yellow_floor, F.lit("YELLOW"))
        .otherwise(F.lit("RED"))
    )


def time_filter(date_key: Column, preset: str, anchor: Column) -> Column:
    """A7 relative time-range predicates resolved against an anchor date
    (docs/quill_dashboard_schema_design_doc.md:139-146).

    ``date_key`` is a yyyy-MM-dd string; weeks are ISO (Mon-Sun). The
    predicate is a pure comparison on the partition column → partition pruning
    at the scan.
    """
    d = F.to_date(date_key)
    week_start = F.date_sub(anchor, F.weekday(anchor))  # Monday
    month_start = F.trunc(anchor, "month")
    presets = {
        "today": d == anchor,
        "yesterday": d == F.date_sub(anchor, 1),
        "this_week": (d >= week_start) & (d <= anchor),
        "last_week": (d >= F.date_sub(week_start, 7)) & (d < week_start),
        "this_month": (d >= month_start) & (d <= anchor),
        "last_month": (d >= F.add_months(month_start, -1)) & (d < month_start),
    }
    if preset not in presets:
        raise ValueError(f"unknown time preset: {preset!r}")
    return presets[preset]


def custom_time_filter(date_key: Column, start: str, end: str) -> Column:
    """A7 'Custom' range (docs/quill_dashboard_schema_design_doc.md:139-146):
    inclusive [start, end] on the business-date key. String comparison is
    correct for yyyy-MM-dd keys and keeps the predicate partition-prunable."""
    return (date_key >= F.lit(start)) & (date_key <= F.lit(end))


def build_dim_date(
    spark: SparkSession, start: str = "2019-01-01", end: str = "2029-12-31"
) -> DataFrame:
    """A8 calendar generation (DimDate seed ±5y,
    docs/quill_dashboard_schema_design_doc.md:92-106). DayOfWeek 1=Mon..7=Sun.

    ``sequence`` + ``explode`` runs distributed; ~4k rows stays
    broadcast-sized for D5 joins.
    """
    return (
        spark.sql(
            f"SELECT explode(sequence(date'{start}', date'{end}', interval 1 day)) AS Date"
        )
        .select(
            "Date",
            F.date_format("Date", "yyyy-MM-dd").alias("DateKey"),
            F.year("Date").cast("long").alias("Year"),
            F.month("Date").cast("long").alias("Month"),
            F.dayofmonth("Date").cast("long").alias("Day"),
            F.date_format("Date", "MMMM").alias("MonthName"),
            F.quarter("Date").cast("long").alias("Quarter"),
            (F.weekday("Date") + 1).cast("long").alias("DayOfWeek"),
            F.date_format("Date", "EEEE").alias("DayName"),
            (F.weekday("Date") >= 5).alias("IsWeekend"),
        )
    )
