"""The adapter = the expression engine (SURVEY.md §2.3, P1-P12).

Re-expresses the reference's Aloware/HubSpot adapters
(``src/adapters/aloware.adapter.ts``, ``src/adapters/hubspot.adapter.ts``) as
pure Spark column expressions over a *webhook-shaped* DataFrame with columns::

    source        string      -- envelope source tag ("ALOWARE", "HUBSPOT", ...)
    event_name    string      -- e.g. "outbound_call" (aloware.adapter.ts:56)
    ext_id        long        -- body.id             (aloware.adapter.ts:92)
    uuid_v4       string      -- body.uuid_v4 fallback id
    direction     long        -- 1=inbound 2=outbound (aloware.adapter.ts:39-42)
    type_code     long        -- 1=call 2=text        (aloware.adapter.ts:47-48)
    created_at_raw string     -- ISO or "YYYY-MM-DD HH:mm:ss" (adapter:24-33)
    owner_id      long        -- preferred agent id   (adapter:84)
    user_id       long        -- fallback agent id
    tz            string      -- contact.timezone IANA (adapter:88-89)
    receivedAt    timestamp   -- envelope arrival     (router.ts:13)

Every function returns a ``Column`` so Catalyst sees one flat projection —
filters fold into the Parquet scan, the whole chain stays inside
whole-stage codegen, and nothing here ever shuffles.

ANSI note: Spark 4 runs ANSI-on by default; the reference's tolerant parses
(invalid timestamp → null, invalid tz → UTC) are expressed with
``try_to_timestamp`` and a whitelist gate instead of exception-driven
fallbacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# P10 source→metric mapping tables (src/domain/mapping.ts:6-14) — static
# literals folded into the classifier expressions (a broadcast-joined mapping
# DF would also work; a 2-row dict does not warrant a join).
ALOWARE_TO_METRIC = {"outbound_call": "CALLS", "outbound_text": "TEXTS"}
HUBSPOT_TO_METRIC = {"email_sent": "EMAILS", "case_created": "CASES"}

# Every valid IANA zone is accepted, anything else falls back to UTC — exactly
# the reference's try/catch semantics (aloware.adapter.ts:19-21). The list is
# materialized once at plan-build time from the system tzdb; membership is a
# broadcast-literal `isin`, still codegen'd (a ~600-element IN over a string
# column is a hash-set probe, not 600 comparisons).
import zoneinfo as _zoneinfo

KNOWN_TIMEZONES = tuple(sorted(_zoneinfo.available_timezones()))


def is_outbound(event_name: Column, direction: Column) -> Column:
    """P3 outbound predicate (aloware.adapter.ts:35-43).

    name contains outbound/outgoing → true; contains inbound → false; else
    direction 2 → true, 1 → false; default false.
    """
    name = F.lower(F.coalesce(event_name, F.lit("")))
    return (
        F.when(name.contains("outbound") | name.contains("outgoing"), F.lit(True))
        .when(name.contains("inbound"), F.lit(False))
        .when(direction == 2, F.lit(True))
        .when(direction == 1, F.lit(False))
        .otherwise(F.lit(False))
    )


def infer_metric(event_name: Column, type_code: Column) -> Column:
    """P4 metric classifier (aloware.adapter.ts:45-52).

    The reference computes ``isText = name has text/sms OR typeCode==2`` and
    tests it BEFORE ``isCall = name has call OR typeCode==1`` — so an event
    named ``outbound_call_x`` with ``type_code=2`` is TEXTS, not CALLS. The
    boolean structure here mirrors that precedence exactly; else NULL (row
    dropped downstream — "no misclassification").
    """
    name = F.lower(F.coalesce(event_name, F.lit("")))
    return (
        F.when(
            name.contains("text") | name.contains("sms") | (type_code == 2),
            F.lit("TEXTS"),
        )
        .when(name.contains("call") | (type_code == 1), F.lit("CALLS"))
        .otherwise(F.lit(None).cast("string"))
    )


# P5 pinned timestamp-format family — THE single source of truth. Each member
# is (spark_format, guard_regex | None, duckdb_expr_template, tz_aware):
#   * spark_format  — strict DateTimeFormatter pattern for try_to_timestamp
#   * guard_regex   — anchored regex applied IDENTICALLY in both engines (and
#     the property-test model). Every member is guarded because the engines'
#     format languages are lenient in different ways: DuckDB strptime accepts
#     non-zero-padded fields ('2024-1-5T3:4:5') that Spark's strict formatter
#     rejects, Spark SSS reads '.1' as .100 (ISO) while DuckDB %g left-pads
#     it to .001, and DuckDB %z accepts offset spellings Spark XXX rejects —
#     each guard restricts both sides to the intersection (zero-padded
#     fields, exactly 3 fraction digits, ±HH:MM offsets ≤ 14:59) so a value
#     can never parse differently, or parse in only one engine.
#   * duckdb_expr_template — '{col}'-templated DuckDB expression producing a
#     naive UTC TIMESTAMP (tz-aware members are normalized via timezone()).
# The family extends the original three (ISO 'T', spaced-UTC, Z-suffix) with
# the millisecond and zone-offset ISO forms real webhook payloads carry
# (JS `new Date` accepts all of these — aloware.adapter.ts:24-33); date-only
# and exotic forms still fall back to receivedAt. Consumers that must stay in
# lock-step: the adapter below, the DuckDB NORMALIZED_CTE
# (sources/webhook_mapping.py), the dead-letter BAD_TIMESTAMP predicate
# (operators/errors.py) + its oracle (plans/registry.py), and the
# property-test model (tests/test_adapter_properties.py).
_MS = r"\.\d{3}"
_BASE_T = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
# Offsets capped at ±14:59 (the real-world IANA range is ±14:00): Java's XXX
# rejects offsets past ±18:00 while DuckDB %z and Python %z accept arbitrary
# ones — the shared guard keeps all three engines inside the agreed set.
_OFFSET = r"[+-](0\d|1[0-4]):[0-5]\d$"
TIMESTAMP_FAMILY: tuple[tuple[str, str | None, str, bool], ...] = (
    (
        "yyyy-MM-dd'T'HH:mm:ss",
        _BASE_T + "$",
        "try_strptime({col}, '%Y-%m-%dT%H:%M:%S')",
        False,
    ),
    (
        "yyyy-MM-dd HH:mm:ss",
        r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$",
        "try_strptime({col}, '%Y-%m-%d %H:%M:%S')",
        False,
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
        _BASE_T + "Z$",
        "try_strptime({col}, '%Y-%m-%dT%H:%M:%SZ')",
        False,
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss.SSS",
        _BASE_T + _MS + "$",
        "try_strptime({col}, '%Y-%m-%dT%H:%M:%S.%g')",
        False,
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
        _BASE_T + _MS + "Z$",
        "try_strptime({col}, '%Y-%m-%dT%H:%M:%S.%gZ')",
        False,
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ssXXX",
        _BASE_T + _OFFSET,
        "timezone('UTC', try_strptime({col}, '%Y-%m-%dT%H:%M:%S%z'))",
        True,
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        _BASE_T + _MS + _OFFSET,
        "timezone('UTC', try_strptime({col}, '%Y-%m-%dT%H:%M:%S.%g%z'))",
        True,
    ),
)


def try_parse_family(raw: Column) -> list[Column]:
    """One try-parse Column per TIMESTAMP_FAMILY member (NULL = no match).
    Guarded members wrap the parse in ``when(rlike)`` so both engines accept
    the exact same string set; all are plain codegen'd expressions."""
    out = []
    for spark_fmt, guard, _, _ in TIMESTAMP_FAMILY:
        parsed = F.try_to_timestamp(raw, F.lit(spark_fmt))
        out.append(parsed if guard is None else F.when(raw.rlike(guard), parsed))
    return out


def timestamp_family_sql(col: str) -> list[str]:
    """The DuckDB mirror: one expression per family member, NULL = no match.
    Generated from the SAME table as the Spark side so the two can only
    change together. (Composed into SQL via replace/concat, never
    ``str.format`` — the guard regexes contain ``{}`` braces.)"""
    exprs = []
    for _, guard, duck_tpl, _ in TIMESTAMP_FAMILY:
        e = duck_tpl.replace("{col}", col)
        if guard is not None:
            e = f"CASE WHEN regexp_matches({col}, '{guard}') THEN {e} END"
        exprs.append(e)
    return exprs


def parse_created_at(raw: Column, received_at: Column) -> Column:
    """P5 timestamp coercion (aloware.adapter.ts:24-33, fallback :87).

    Accepts EXACTLY the pinned TIMESTAMP_FAMILY — ISO 'T' form, the space-
    separated form (treated as UTC per the reference's replace-and-append-Z
    normalization), the Z-suffixed ISO form, and the millisecond / ±HH:MM
    zone-offset variants (offsets normalized to UTC) — anything else
    (date-only, short fractions, compact offsets) falls back to
    ``receivedAt``. Explicit format literals + shared guards instead of the
    lenient ``try_to_timestamp`` default keep the accepted family
    engine-portable: the DuckDB oracle, the dead-letter BAD_TIMESTAMP
    predicate, and the property-test model all derive from the same pinned
    table, so one row can never be "parsed" in one place and "unparseable"
    in another. (Deliberate narrowing vs the reference's JS ``new Date``,
    which accepts engine-specific extras no SQL engine mirrors exactly.)
    Session tz is UTC → naive forms read as UTC instants.
    """
    return F.coalesce(*try_parse_family(raw), received_at)


def effective_tz(tz: Column) -> Column:
    """Invalid/missing tz → UTC (aloware.adapter.ts:19-21)."""
    return F.when(tz.isin(*KNOWN_TIMEZONES), tz).otherwise(F.lit("UTC"))


def business_date_key(event_ts_utc: Column, tz: Column) -> Column:
    """P6 timezone-aware business date (aloware.adapter.ts:4-22).

    Formats the UTC instant as yyyy-MM-dd in the per-row IANA tz.
    ``from_utc_timestamp`` natively accepts a *column* tz — per-row timezones
    without any UDF.
    """
    return F.date_format(
        F.from_utc_timestamp(event_ts_utc, effective_tz(tz)), "yyyy-MM-dd"
    )


def agent_id(owner_id: Column, user_id: Column) -> Column:
    """P7 agent identity: ``String(owner_id ?? user_id ?? "unknown")``
    (aloware.adapter.ts:84)."""
    return F.coalesce(
        owner_id.cast("string"), user_id.cast("string"), F.lit("unknown")
    )


def event_id(source: Column, ext_id: Column, uuid_v4: Column, received_at: Column) -> Column:
    """P8 deterministic event id: ``SOURCE:{id ?? uuid ?? epochMillis(receivedAt)}``
    (aloware.adapter.ts:92-93). The fallback is TRUE epoch milliseconds
    (``Date.parse`` semantics) — sub-second receivedAt values must not
    truncate to whole seconds, or same-second events would collide."""
    ext = F.coalesce(
        ext_id.cast("string"),
        uuid_v4,
        F.floor(F.unix_micros(received_at) / 1000).cast("long").cast("string"),
    )
    return F.concat_ws(":", source, ext)


def notes(event_name: Column, tz: Column, owner_id: Column, user_id: Column) -> Column:
    """P9 notes assembly (aloware.adapter.ts:95-99): join present parts with
    ``;`` — ``concat_ws`` natively skips nulls.

    The agent=unknown part uses the reference's FALSY check
    (``!body?.owner_id && !body?.user_id``): owner_id=0/user_id=0 count as
    missing for the note even though the derived AgentID is then '0' (the
    ``??`` nullish coalesce keeps zero). The note is therefore computed from
    the raw id columns, not from the derived AgentID string."""
    owner_falsy = owner_id.isNull() | (owner_id == 0)
    user_falsy = user_id.isNull() | (user_id == 0)
    return F.concat_ws(
        ";",
        F.when(event_name.isNotNull(), F.concat(F.lit("event="), event_name)),
        F.when(tz.isNotNull(), F.concat(F.lit("tz="), tz)),
        F.when(owner_falsy & user_falsy, F.lit("agent=unknown")),
    )


def normalize_webhooks(df: DataFrame) -> DataFrame:
    """Full adapter pipeline: webhook-shaped DF → FactEvent rows.

    One select chain = scan → project → filter, exactly the shape Catalyst
    pushes into the Parquet scan. Mirrors alowareAdapter
    (src/adapters/aloware.adapter.ts:54-118): outbound gate (:71-74), metric
    gate (:76-81), then field derivations.
    """
    ts = parse_created_at(F.col("created_at_raw"), F.col("receivedAt"))
    agent = agent_id(F.col("owner_id"), F.col("user_id"))
    return (
        df.filter(is_outbound(F.col("event_name"), F.col("direction")))
        .withColumn("MetricID", infer_metric(F.col("event_name"), F.col("type_code")))
        .filter(F.col("MetricID").isNotNull())
        .select(
            event_id(
                F.col("source"), F.col("ext_id"), F.col("uuid_v4"), F.col("receivedAt")
            ).alias("EventID"),
            agent.alias("AgentID"),
            business_date_key(ts, F.col("tz")).alias("FactDateKey"),
            F.col("MetricID"),
            notes(
                F.col("event_name"), F.col("tz"), F.col("owner_id"), F.col("user_id")
            ).alias("Notes"),
            ts.alias("EventTime"),  # kept for dedup windows / watermarks
        )
    )


def to_physical_rows(fact: DataFrame) -> DataFrame:
    """P12 write-time projection (post-factevent.service.ts:18-24): physical
    column set, ``Notes`` null→''."""
    return fact.select(
        "EventID",
        "AgentID",
        "FactDateKey",
        "MetricID",
        F.coalesce(F.col("Notes"), F.lit("")).alias("Notes"),
    )


def hubspot_placeholder(df: DataFrame) -> DataFrame:
    """P11 HubSpot adapter stub (src/adapters/hubspot.adapter.ts:3-30): one
    placeholder EMAILS row per envelope; dateKey = iso.slice(0,10)."""
    return df.select(
        F.concat_ws(":", F.lit("HUBSPOT"), F.col("ext_id").cast("string")).alias(
            "EventID"
        ),
        F.lit("unknown").alias("AgentID"),
        F.substring(F.date_format(F.col("receivedAt"), "yyyy-MM-dd'T'HH:mm:ss"), 1, 10).alias(
            "FactDateKey"
        ),
        F.lit("EMAILS").alias("MetricID"),
        F.lit("hubspot placeholder").alias("Notes"),
    )
