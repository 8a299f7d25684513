"""Property-based tests: the adapter expression chain (functions/adapter.py)
must agree with an independent pure-Python model of the reference semantics
(src/adapters/aloware.adapter.ts:4-118) on arbitrary webhook inputs —
including the cascade orders, tz fallback, and timestamp coercion edges."""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from hypothesis import given, settings
from hypothesis import strategies as st

from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
    KNOWN_TIMEZONES,
    normalize_webhooks,
)

RECEIVED = dt.datetime(2024, 1, 15, 12, 0, 0)

event_names = st.sampled_from(
    [
        None,
        "outbound_call",
        "inbound_call",
        "Outgoing SMS",
        "text_message",
        "CALL_COMPLETED",
        "outbound_text",
        "outbound_sms_call",  # text beats call in the classifier cascade
        "generic_event",
        "OUTBOUND",
        "something_inbound_outbound",  # outbound check runs first
    ]
)
directions = st.sampled_from([None, 1, 2, 3])
type_codes = st.sampled_from([None, 1, 2, 7])
createds = st.sampled_from(
    [
        None,
        "2024-01-15T10:30:00",
        "2024-01-15 10:30:00",
        "2024-01-14T23:59:59Z",
        "2024-02-30 10:00:00",  # invalid date → fallback to receivedAt
        "not-a-date",
        "2023-12-31T23:30:00",
        # outside the explicit three-format family → fallback (locks the
        # deliberate narrowing vs JS `new Date`: fractional seconds, offsets,
        # and date-only strings are NOT silently parsed)
        "2024-01-15T10:30:00.123",
        "2024-01-15T10:30:00+02:00",
        "2024-01-15",
        "2024-1-5T3:4:5",  # non-zero-padded: Python strptime would take it,
        # Spark's strict formatter does not → must fall back
    ]
)
tzs = st.sampled_from(
    [
        None,
        "UTC",
        "America/New_York",
        "Asia/Tokyo",
        "Australia/Sydney",
        "Mars/Olympus",
        # valid IANA zone that was NOT in the old 12-zone whitelist — locks the
        # accept-any-valid-zone semantics (aloware.adapter.ts:19-21)
        "America/Anchorage",
    ]
)
# 0 included: the reference's ?? keeps 0 for AgentID but its falsy notes check
# treats 0 as missing — both paths must be exercised
ids = st.one_of(st.none(), st.integers(min_value=0, max_value=99999))

rows = st.fixed_dictionaries(
    {
        "event_name": event_names,
        "direction": directions,
        "type_code": type_codes,
        "created_at_raw": createds,
        "tz": tzs,
        "owner_id": ids,
        "user_id": ids,
        "ext_id": ids,
        "uuid_v4": st.one_of(st.none(), st.just("u-4242")),
    }
)


def model_outbound(name, direction):
    n = (name or "").lower()
    if "outbound" in n or "outgoing" in n:
        return True
    if "inbound" in n:
        return False
    if direction == 2:
        return True
    return False


def model_metric(name, type_code):
    # isText is computed AND TESTED before isCall (aloware.adapter.ts:45-52)
    n = (name or "").lower()
    if "text" in n or "sms" in n or type_code == 2:
        return "TEXTS"
    if "call" in n or type_code == 1:
        return "CALLS"
    return None


def model_ts(raw):
    # Mirrors parse_created_at's EXACT three-format family (the engine-
    # portable narrowing of the reference's JS `new Date`): ISO 'T' form,
    # spaced form (UTC), Z-suffixed ISO. Anything else → receivedAt. The
    # strftime round-trip rejects what Python's strptime would leniently
    # accept but Spark's strict DateTimeFormatter does not (non-zero-padded
    # fields like '2024-1-5T3:4:5').
    if raw is None:
        return RECEIVED
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%SZ"):
        try:
            parsed = dt.datetime.strptime(raw, fmt)
        except ValueError:
            continue
        if parsed.strftime(fmt) == raw:
            return parsed
    return RECEIVED


def model_date_key(ts_utc, tz):
    zone = tz if tz in KNOWN_TIMEZONES else "UTC"
    return ts_utc.replace(tzinfo=dt.timezone.utc).astimezone(ZoneInfo(zone)).strftime(
        "%Y-%m-%d"
    )


def model_row(r):
    if not model_outbound(r["event_name"], r["direction"]):
        return None
    metric = model_metric(r["event_name"], r["type_code"])
    if metric is None:
        return None
    agent = str(r["owner_id"] if r["owner_id"] is not None else (
        r["user_id"] if r["user_id"] is not None else "unknown"))
    ext = (
        str(r["ext_id"]) if r["ext_id"] is not None
        else (r["uuid_v4"] if r["uuid_v4"] is not None
              else str(int(RECEIVED.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)))
    )
    parts = []
    if r["event_name"] is not None:
        parts.append(f"event={r['event_name']}")
    if r["tz"] is not None:
        parts.append(f"tz={r['tz']}")
    if not r["owner_id"] and not r["user_id"]:  # falsy: None OR 0
        parts.append("agent=unknown")
    return {
        "EventID": f"ALOWARE:{ext}",
        "AgentID": agent,
        "FactDateKey": model_date_key(model_ts(r["created_at_raw"]), r["tz"]),
        "MetricID": metric,
        "Notes": ";".join(parts),
    }


@settings(max_examples=12, deadline=None)
@given(st.lists(rows, min_size=1, max_size=40))
def test_adapter_matches_reference_model(spark, batch):
    df = spark.createDataFrame(
        [
            (
                "ALOWARE",
                r["event_name"],
                r["ext_id"],
                r["uuid_v4"],
                r["direction"],
                r["type_code"],
                r["created_at_raw"],
                r["owner_id"],
                r["user_id"],
                r["tz"],
                RECEIVED,
            )
            for r in batch
        ],
        "source string, event_name string, ext_id long, uuid_v4 string, "
        "direction long, type_code long, created_at_raw string, owner_id long, "
        "user_id long, tz string, receivedAt timestamp",
    )
    got = [
        {
            "EventID": r.EventID,
            "AgentID": r.AgentID,
            "FactDateKey": r.FactDateKey,
            "MetricID": r.MetricID,
            "Notes": r.Notes,
        }
        for r in normalize_webhooks(df).collect()
    ]
    want = [m for m in (model_row(r) for r in batch) if m is not None]
    key = lambda d: sorted(d.items())  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
