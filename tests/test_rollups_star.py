"""Analytic layer (A3-A8) and dimension workflows (C1-C5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import rollups, star


def test_dim_date_attributes(spark):
    dd = {r.DateKey: r for r in rollups.build_dim_date(spark, "2024-01-01", "2024-01-07").collect()}
    mon, sat, sun = dd["2024-01-01"], dd["2024-01-06"], dd["2024-01-07"]
    assert (mon.DayOfWeek, mon.DayName, mon.IsWeekend) == (1, "Monday", False)
    assert (sat.DayOfWeek, sat.IsWeekend) == (6, True)
    assert (sun.DayOfWeek, sun.IsWeekend) == (7, True)
    assert mon.MonthName == "January" and mon.Quarter == 1


def test_time_filter_presets(spark):
    # anchor Sat 2024-01-20; ISO week starts Mon 2024-01-15
    df = spark.createDataFrame(
        [("2024-01-20",), ("2024-01-19",), ("2024-01-15",), ("2024-01-14",), ("2023-12-31",), ("2024-01-01",)],
        "FactDateKey string",
    )
    anchor = F.to_date(F.lit("2024-01-20"))

    def keys(preset):
        return {
            r.FactDateKey
            for r in df.filter(rollups.time_filter(F.col("FactDateKey"), preset, anchor)).collect()
        }

    assert keys("today") == {"2024-01-20"}
    assert keys("yesterday") == {"2024-01-19"}
    assert keys("this_week") == {"2024-01-20", "2024-01-19", "2024-01-15"}
    assert keys("last_week") == {"2024-01-14"}
    assert keys("this_month") == {"2024-01-20", "2024-01-19", "2024-01-15", "2024-01-14", "2024-01-01"}
    assert keys("last_month") == {"2023-12-31"}
    with pytest.raises(ValueError):
        rollups.time_filter(F.col("FactDateKey"), "nope", anchor)

    # A7 'Custom': inclusive range on the string date key
    custom = {
        r.FactDateKey
        for r in df.filter(
            rollups.custom_time_filter(F.col("FactDateKey"), "2024-01-14", "2024-01-19")
        ).collect()
    }
    assert custom == {"2024-01-14", "2024-01-15", "2024-01-19"}


def test_color_classification_boundaries(spark):
    df = spark.createDataFrame(
        [(1.0, 0.5), (0.5, 0.5), (0.44, 0.5), (0.425, 0.5), (0.42, 0.5), (0.1, 0.5)],
        "goal double, elapsed double",
    )
    out = [
        r.c
        for r in df.select(
            rollups.color_class(F.col("goal"), F.col("elapsed"), F.lit(0.85)).alias("c")
        ).collect()
    ]
    # yellow floor = elapsed * 0.85 = 0.425 (inclusive)
    assert out == ["GREEN", "GREEN", "YELLOW", "YELLOW", "RED", "RED"]


def test_shift_elapsed_clamps(spark):
    df = spark.createDataFrame(
        [("2024-01-20 13:00:00", "2024-01-20 09:00:00", "2024-01-20 17:00:00")],
        "now string, start string, end string",
    )
    r = df.select(
        rollups.shift_elapsed_pct(
            F.to_timestamp("now"), F.to_timestamp("start"), F.to_timestamp("end")
        ).alias("pct")
    ).collect()[0]
    assert r.pct == 0.5
    past = df.select(
        rollups.shift_elapsed_pct(
            F.to_timestamp(F.lit("2024-01-21 13:00:00")),
            F.to_timestamp("start"),
            F.to_timestamp("end"),
        ).alias("pct")
    ).collect()[0]
    assert past.pct == 1.0


def test_dim_agent_sync_contract(spark):
    """Mirrors the reference's three contract cases
    (tests/dimagent-sync.test.ts): happy path, dry-run fetch-only,
    zero-roster clears-but-skips-push."""
    roster = spark.createDataFrame(
        [("1", "Ann", "a@x", "", True), ("2", "Bo", "b@x", "", True)],
        "AgentID string, AgentName string, Email string, TimezoneIANA string, ActiveFlag boolean",
    )
    df, res = star.sync_dim_agent(roster)
    assert res == {"fetched": 2, "cleared": True, "pushed": 2, "dryRun": False}
    assert df.count() == 2

    df, res = star.sync_dim_agent(roster, dry_run=True)
    assert df is None
    assert res == {"fetched": 2, "cleared": False, "pushed": 0, "dryRun": True}

    empty = roster.limit(0)
    df, res = star.sync_dim_agent(empty)
    assert res == {"fetched": 0, "cleared": True, "pushed": 0, "dryRun": False}
    assert df.count() == 0

    with pytest.raises(ValueError):
        star.sync_dim_agent(None)


def test_ensure_dims_anti_join(spark):
    dim = spark.createDataFrame([("2024-01-01",), ("2024-01-02",)], "DateKey string")
    hints = spark.createDataFrame(
        [("2024-01-02",), ("2024-01-03",), ("2024-01-03",)], "DateKey string"
    )
    missing = {r.DateKey for r in star.ensure_dims(dim, hints, "DateKey").collect()}
    assert missing == {"2024-01-03"}


def test_dim_hints_shape(spark):
    fact = spark.createDataFrame(
        [("a1", "2024-01-01", "CALLS"), ("a1", "2024-01-02", "TEXTS")],
        "AgentID string, FactDateKey string, MetricID string",
    )
    r = rollups.dim_hints(fact).collect()[0]
    assert r.agentIds == ["a1"]
    assert r.dates == ["2024-01-01", "2024-01-02"]
    assert sorted(r.metrics) == ["CALLS", "TEXTS"]


def test_star_join_composite_shift_key(spark):
    fact = spark.createDataFrame(
        [("a1", "2024-01-01", "CALLS", "e1")],
        "AgentID string, FactDateKey string, MetricID string, EventID string",
    )
    agents = spark.createDataFrame([("a1",)], "AgentID string")
    dates = rollups.build_dim_date(spark, "2024-01-01", "2024-01-02")
    shifts = star.build_dim_shift(agents, dates, start_hour=9, shift_hours=8)
    joined = star.star_join(fact, dim_shift=shifts)
    r = joined.collect()[0]
    assert r.ShiftHours == 8
    assert str(r.ShiftStartLocal) == "2024-01-01 09:00:00"


def test_asof_join_semantics(spark):
    """Backward as-of: greatest right_ts <= left_ts; equality matches; no
    prior row -> null; keys never cross."""
    import datetime as dt

    from quill_agent_dashboard_pbi_etl_spark.operators.asof import asof_join

    t = lambda h: dt.datetime(2024, 1, 15, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "a", t(9)), (2, "a", t(10)), (3, "a", t(12)), (4, "b", t(10))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(10), 100.0), ("a", t(11), 200.0), ("b", t(11), 999.0)],
        "k string, rts timestamp, v double",
    )
    out = {
        r.id: r.v
        for r in asof_join(left, right, ["k"], "ts", "rts", ["v"]).collect()
    }
    assert out[1] is None        # 09:00 — no prior snapshot
    assert out[2] == 100.0       # 10:00 — exact-ts snapshot matches
    assert out[3] == 200.0       # 12:00 — latest prior (11:00), not first
    assert out[4] is None        # key b: snapshot is later than the event


def test_interval_join_semantics(spark):
    """Half-open containment, bucket-boundary crossing, per-key isolation."""
    import datetime as dt

    from quill_agent_dashboard_pbi_etl_spark.operators.intervals import interval_join

    left = spark.createDataFrame(
        [
            (1, "a", dt.datetime(2024, 1, 15, 9, 0)),   # == start: included
            (2, "a", dt.datetime(2024, 1, 15, 17, 0)),  # == end: excluded
            (3, "a", dt.datetime(2024, 1, 16, 1, 0)),   # overnight interval tail
            (4, "b", dt.datetime(2024, 1, 15, 10, 0)),  # key b has no interval
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 15, 9, 0), dt.datetime(2024, 1, 15, 17, 0)),
            ("a", dt.datetime(2024, 1, 15, 22, 0), dt.datetime(2024, 1, 16, 2, 0)),
        ],
        "k string, start timestamp, end timestamp",
    )
    got = sorted(
        r.id for r in interval_join(left, right, ["k"], "ts", "start", "end").collect()
    )
    assert got == [1, 3]  # boundary-end excluded; cross-midnight matched

    inc = sorted(
        r.id
        for r in interval_join(
            left, right, ["k"], "ts", "start", "end", inclusive_end=True
        ).collect()
    )
    assert inc == [1, 2, 3]
