"""Adapter edge cases (FIXTURES.md §1): non-outbound drop, unknown-metric
drop, tz fallback, space-separated timestamps, missing created_at, unknown
agent, uuid fallback, notes assembly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
    hubspot_placeholder,
    normalize_webhooks,
    to_physical_rows,
)

WEBHOOK_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("event_name", StringType()),
        StructField("ext_id", LongType()),
        StructField("uuid_v4", StringType()),
        StructField("direction", LongType()),
        StructField("type_code", LongType()),
        StructField("created_at_raw", StringType()),
        StructField("owner_id", LongType()),
        StructField("user_id", LongType()),
        StructField("tz", StringType()),
        StructField("receivedAt", TimestampType()),
    ]
)

RECV = dt.datetime(2024, 1, 15, 12, 0, 0)


def mk(spark, rows):
    return spark.createDataFrame(rows, WEBHOOK_SCHEMA)


def row(**kw):
    base = dict(
        source="ALOWARE",
        event_name="outbound_call",
        ext_id=1,
        uuid_v4=None,
        direction=None,
        type_code=None,
        created_at_raw="2024-01-15T03:00:00",
        owner_id=42,
        user_id=7,
        tz="UTC",
        receivedAt=RECV,
    )
    base.update(kw)
    return tuple(base[f.name] for f in WEBHOOK_SCHEMA.fields)


def test_happy_path_call(spark):
    out = normalize_webhooks(mk(spark, [row()])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.EventID == "ALOWARE:1"
    assert r.AgentID == "42"
    assert r.MetricID == "CALLS"
    assert r.FactDateKey == "2024-01-15"
    assert r.Notes == "event=outbound_call;tz=UTC"


def test_inbound_dropped(spark):
    # name contains inbound → dropped even with direction=2 (aloware.adapter.ts:35-43)
    out = normalize_webhooks(
        mk(spark, [row(event_name="inbound_call", direction=2)])
    ).collect()
    assert out == []


def test_direction_fallback(spark):
    rows = [
        row(event_name="generic", direction=2, type_code=1, ext_id=1),
        row(event_name="generic", direction=1, type_code=1, ext_id=2),
        row(event_name="generic", direction=None, type_code=1, ext_id=3),
    ]
    out = normalize_webhooks(mk(spark, rows)).collect()
    assert [r.EventID for r in out] == ["ALOWARE:1"]


def test_unknown_metric_dropped(spark):
    # outbound but no metric signal → dropped, "no misclassification"
    out = normalize_webhooks(
        mk(spark, [row(event_name="outbound_fax", type_code=9)])
    ).collect()
    assert out == []


def test_metric_from_type_code(spark):
    rows = [
        row(event_name="generic", direction=2, type_code=2, ext_id=1),
        row(event_name="outgoing_sms_blast", ext_id=2),
    ]
    out = {r.EventID: r.MetricID for r in normalize_webhooks(mk(spark, rows)).collect()}
    assert out == {"ALOWARE:1": "TEXTS", "ALOWARE:2": "TEXTS"}


def test_text_typecode_beats_call_name(spark):
    # isText (name has text/sms OR type==2) is tested BEFORE isCall in the
    # reference (aloware.adapter.ts:45-52): call-named event with type_code=2
    # classifies TEXTS, not CALLS.
    out = normalize_webhooks(
        mk(spark, [row(event_name="outbound_call_x", type_code=2)])
    ).collect()
    assert out[0].MetricID == "TEXTS"


def test_zero_ids_note_but_agent_zero(spark):
    # falsy notes check (!owner_id && !user_id): zero ids get the
    # agent=unknown note while AgentID is '0' (?? keeps zero)
    out = normalize_webhooks(
        mk(spark, [row(owner_id=0, user_id=0, tz=None)])
    ).collect()
    r = out[0]
    assert r.AgentID == "0"
    assert r.Notes == "event=outbound_call;agent=unknown"


def test_off_whitelist_valid_zone_accepted(spark):
    # any valid IANA zone works, not just a hand-picked subset: 03:00Z Jan 15
    # is Jan 14 18:00 in America/Anchorage (UTC-9)
    out = normalize_webhooks(mk(spark, [row(tz="America/Anchorage")])).collect()
    assert out[0].FactDateKey == "2024-01-14"


def test_tz_business_date(spark):
    # 03:00Z on Jan 15 is Jan 14 in America/Los_Angeles (FIXTURES.md edge case)
    out = normalize_webhooks(
        mk(spark, [row(tz="America/Los_Angeles")])
    ).collect()
    assert out[0].FactDateKey == "2024-01-14"


def test_invalid_tz_falls_back_to_utc(spark):
    out = normalize_webhooks(mk(spark, [row(tz="Not/AZone")])).collect()
    assert out[0].FactDateKey == "2024-01-15"
    assert "tz=Not/AZone" in out[0].Notes  # notes keep the raw payload value


def test_space_separated_timestamp(spark):
    out = normalize_webhooks(
        mk(spark, [row(created_at_raw="2024-01-14 23:30:00", tz="UTC")])
    ).collect()
    assert out[0].FactDateKey == "2024-01-14"


def test_missing_created_at_falls_back_to_received(spark):
    out = normalize_webhooks(
        mk(spark, [row(created_at_raw=None), row(created_at_raw="garbage", ext_id=2)])
    ).collect()
    assert {r.FactDateKey for r in out} == {"2024-01-15"}  # receivedAt date


def test_unknown_agent_and_notes(spark):
    out = normalize_webhooks(
        mk(spark, [row(owner_id=None, user_id=None, tz=None)])
    ).collect()
    r = out[0]
    assert r.AgentID == "unknown"
    assert r.Notes == "event=outbound_call;agent=unknown"


def test_owner_fallback_to_user(spark):
    out = normalize_webhooks(mk(spark, [row(owner_id=None, user_id=9)])).collect()
    assert out[0].AgentID == "9"


def test_uuid_fallback_id(spark):
    out = normalize_webhooks(
        mk(spark, [row(ext_id=None, uuid_v4="abc-123")])
    ).collect()
    assert out[0].EventID == "ALOWARE:abc-123"


def test_epoch_fallback_id(spark):
    out = normalize_webhooks(mk(spark, [row(ext_id=None, uuid_v4=None)])).collect()
    epoch_ms = int(RECV.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert out[0].EventID == f"ALOWARE:{epoch_ms}"


def test_physical_rows_null_notes_to_empty(spark):
    fact = normalize_webhooks(mk(spark, [row()]))
    phys = to_physical_rows(fact.withColumn("Notes", F.lit(None).cast("string")))
    assert phys.collect()[0].Notes == ""
    assert phys.columns == ["EventID", "AgentID", "FactDateKey", "MetricID", "Notes"]


def test_hubspot_placeholder(spark):
    env = spark.createDataFrame(
        [(5, RECV)],
        StructType(
            [StructField("ext_id", LongType()), StructField("receivedAt", TimestampType())]
        ),
    )
    r = hubspot_placeholder(env).collect()[0]
    assert r.EventID == "HUBSPOT:5"
    assert r.MetricID == "EMAILS"
    assert r.FactDateKey == "2024-01-15"
