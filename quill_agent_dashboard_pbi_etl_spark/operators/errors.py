"""FactErrorLog dead-letter routing.

The reference leaves ingestion-error tracking as an open design question
("Should we track ingestion errors in a FactErrorLog table?",
docs/quill_dashboard_schema_design_doc.md:194) and silently drops
non-outbound / unclassifiable events (aloware.adapter.ts:71-81). This
operator closes that gap: every webhook row the adapter would DROP is routed
as an ERROR, and every row it would KEEP with degraded fields is routed as a
WARN, each with a machine-readable code — the standard dead-letter-queue
companion to the happy-path pipeline.

Codes:
  NOT_OUTBOUND         ERROR  dropped by the outbound gate (P3)
  UNCLASSIFIED_METRIC  ERROR  outbound but no CALLS/TEXTS class (P4)
  BAD_TIMESTAMP        WARN   created_at present but unparseable → receivedAt
                              fallback (P5)
  BAD_TIMEZONE         WARN   tz present but not a valid IANA zone → UTC
                              fallback (P6)
  AGENT_UNKNOWN        WARN   neither owner_id nor user_id → AgentID
                              'unknown' (P7)

One narrow pass over the webhook batch: all five predicates evaluate in a
single projection, a compacted literal-struct array explodes to one row per
(event, code), and clean rows vanish (explode of an empty array emits
nothing) — no UDF, no second scan, trivially partition-parallel at any
scale. Severity is carried per code so a downstream sink can alert on ERROR
volume while merely sampling WARNs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.adapter import (
    KNOWN_TIMEZONES,
    event_id,
    infer_metric,
    is_outbound,
    try_parse_family,
)


def _code(cond: Column, code: str, severity: str) -> Column:
    return F.when(
        cond,
        F.struct(F.lit(code).alias("error_code"), F.lit(severity).alias("severity")),
    )


def route_dead_letters(webhooks: DataFrame) -> DataFrame:
    """Webhook-shaped batch → FactErrorLog rows
    (EventID, source, error_code, severity, received_date)."""
    # BAD_TIMESTAMP mirrors parse_created_at's EXACT pinned format family
    # (functions/adapter.py TIMESTAMP_FAMILY, P5) by construction — the
    # predicate is generated from the same table as the adapter's coalesce
    # and the DuckDB oracle's expression list, so a row flagged
    # BAD_TIMESTAMP here is guaranteed to be the same row the adapter
    # actually coerced to receivedAt, in both engines.
    tries = try_parse_family(F.col("created_at_raw"))
    parse_failed = F.col("created_at_raw").isNotNull()
    for t in tries:
        parse_failed = parse_failed & t.isNull()
    outbound = is_outbound(F.col("event_name"), F.col("direction"))
    metric = infer_metric(F.col("event_name"), F.col("type_code"))
    bad_tz = F.col("tz").isNotNull() & ~F.col("tz").isin(*KNOWN_TIMEZONES)
    agent_unknown = F.col("owner_id").isNull() & F.col("user_id").isNull()

    codes = F.array_compact(
        F.array(
            _code(~outbound, "NOT_OUTBOUND", "ERROR"),
            _code(outbound & metric.isNull(), "UNCLASSIFIED_METRIC", "ERROR"),
            _code(parse_failed, "BAD_TIMESTAMP", "WARN"),
            _code(bad_tz, "BAD_TIMEZONE", "WARN"),
            _code(agent_unknown, "AGENT_UNKNOWN", "WARN"),
        )
    )
    return webhooks.select(
        event_id(
            F.col("source"), F.col("ext_id"), F.col("uuid_v4"), F.col("receivedAt")
        ).alias("EventID"),
        F.col("source"),
        F.date_format(F.col("receivedAt"), "yyyy-MM-dd").alias("received_date"),
        F.explode(codes).alias("err"),
    ).select(
        "EventID",
        "source",
        F.col("err.error_code").alias("error_code"),
        F.col("err.severity").alias("severity"),
        "received_date",
    )
