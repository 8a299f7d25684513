"""Property-based tests: the adapter expression chain (functions/adapter.py)
must agree with an independent pure-Python model of the reference semantics
(src/adapters/aloware.adapter.ts:4-118) on arbitrary webhook inputs —
including the cascade orders, tz fallback, and timestamp coercion edges."""

from __future__ import annotations

import datetime as dt
import re
from zoneinfo import ZoneInfo

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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
CREATED_STRINGS = [
        None,
        "2024-01-15T10:30:00",
        "2024-01-15 10:30:00",
        "2024-01-14T23:59:59Z",
        "2024-02-30 10:00:00",  # invalid date → fallback to receivedAt
        "not-a-date",
        "2023-12-31T23:30:00",
        # in-family millisecond / offset forms (parsed since round 6; offsets
        # normalize to UTC — the +11:00 case crosses a date boundary)
        "2024-01-15T10:30:00.123",
        "2024-01-15T10:30:00.999Z",
        "2024-01-15T10:30:00+02:00",
        "2024-01-15T10:30:00-05:00",
        "2024-01-01T03:30:00+11:00",  # UTC date is 2023-12-31
        "2024-01-15T10:30:00.123+02:00",
        "2024-01-15T23:59:59.500-01:30",
        "2024-02-30T10:00:00.123",  # shape matches, date invalid → fallback
        # OUTSIDE the pinned family → fallback (locks the deliberate
        # narrowing vs JS `new Date`: short/long fractions, compact or
        # out-of-range offsets, and date-only strings are NOT parsed)
        "2024-01-15T10:30:00.1",
        "2024-01-15T10:30:00.1234",
        "2024-01-15T10:30:00+0200",
        "2024-01-15T10:30:00+19:00",
        "2024-01-15T10:30:00.123 Z",
        "2024-01-15",
        "2024-1-5T3:4:5",  # non-zero-padded: Python strptime would take it,
        # Spark's strict formatter does not → must fall back
]
createds = st.sampled_from(CREATED_STRINGS)
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


# Independent mirror of adapter.TIMESTAMP_FAMILY: (anchored regex, Python
# strptime format, tz_aware). The regexes characterize exactly what the
# engines' strict formatters accept (zero-padded fields, exactly-3-digit
# fractions, ±HH:MM offsets ≤ 14:59) so Python's lenient strptime can't
# admit strings Spark/DuckDB reject.
_MODEL_FAMILY = (
    (r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$", "%Y-%m-%dT%H:%M:%S", False),
    (r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$", "%Y-%m-%d %H:%M:%S", False),
    (r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$", "%Y-%m-%dT%H:%M:%SZ", False),
    (r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}$", "%Y-%m-%dT%H:%M:%S.%f", False),
    (r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$", "%Y-%m-%dT%H:%M:%S.%fZ", False),
    (
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}[+-](0\d|1[0-4]):[0-5]\d$",
        "%Y-%m-%dT%H:%M:%S%z",
        True,
    ),
    (
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}[+-](0\d|1[0-4]):[0-5]\d$",
        "%Y-%m-%dT%H:%M:%S.%f%z",
        True,
    ),
)


def model_ts(raw):
    # Mirrors parse_created_at's EXACT pinned family (the engine-portable
    # narrowing of the reference's JS `new Date`). Anything outside the
    # regex-guarded set → receivedAt; offset forms normalize to naive UTC
    # (matching Spark's UTC session rendering and the oracle's
    # timezone('UTC', ...) conversion).
    if raw is None:
        return RECEIVED
    for rx, fmt, tz_aware in _MODEL_FAMILY:
        if not re.match(rx, raw):
            continue
        try:
            parsed = dt.datetime.strptime(raw, fmt)
        except ValueError:
            continue  # shape matched but the date is invalid (e.g. Feb 30)
        if tz_aware:
            parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
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


def test_timestamp_family_three_way_lockstep(spark):
    """Spark parse_created_at, the generated DuckDB family SQL, and the
    Python model must classify AND parse every adversarial string
    identically — the three pinned sites are generated/mirrored from one
    table; this locks them together on the full accept/reject boundary."""
    import duckdb

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        parse_created_at,
        timestamp_family_sql,
    )

    strings = [s for s in CREATED_STRINGS if s is not None] + [
        "2024-01-15T10:30:00+14:59",  # boundary of the offset guard
        "2024-01-15T10:30:00+15:00",  # just past it → reject everywhere
        "2024-01-15T10:30:00-00:00",
        "2024-01-15T10:30:00.000Z",
        "2024-12-31T23:59:59.999-14:30",
        "9999-12-31T23:59:59.999+00:01",
        "2024-01-15t10:30:00",  # lowercase t → reject
        " 2024-01-15T10:30:00",  # leading space → reject
        "2024-01-15T10:30:00 ",  # trailing space → reject
    ]

    df = spark.createDataFrame(
        [(s, RECEIVED) for s in strings], "raw string, receivedAt timestamp"
    )
    spark_out = {
        r.raw: r.parsed
        for r in df.select(
            "raw",
            parse_created_at(F.col("raw"), F.col("receivedAt")).alias("parsed"),
        ).collect()
    }

    family = ",\n".join(timestamp_family_sql("raw"))
    con = duckdb.connect()
    con.execute("SET timezone = 'UTC'")
    duck_out = {}
    for s in strings:
        duck_out[s] = con.execute(
            "SELECT coalesce(" + family + ", TIMESTAMP '2024-01-15 12:00:00') "
            "FROM (SELECT ? AS raw)",
            [s],
        ).fetchone()[0]

    for s in strings:
        want = model_ts(s)
        assert spark_out[s] == want, f"spark vs model on {s!r}"
        assert duck_out[s] == want, f"duckdb vs model on {s!r}"
