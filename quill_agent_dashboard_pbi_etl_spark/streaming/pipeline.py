"""Streaming ingest pipeline (SURVEY.md §2.7, §3.1).

The reference is an event-at-a-time webhook service (one POST = one 1-row
batch, ≤15-min dashboard SLA). In Spark the same normalize → dedup → write
graph compiles once and runs under Structured Streaming:

  * S1/S2 webhook entry → a JSON landing directory watched by ``readStream``
    (prod swap: Kafka source — same downstream graph).
  * D1/D3 dedup → ``withWatermark(event_time, 14 days)`` +
    ``dropDuplicatesWithinWatermark`` on the dedup key: the streaming state
    store takes the role of the DynamoDB TTL ledger
    (ledger.repo.ts:10-12's DYNAMO_TTL_DAYS default 14).
  * Late data: accepted at any lateness within the watermark; rows land on
    their event-time-derived FactDateKey partition (append mode, no window
    closure — aloware.adapter.ts:87-89 semantics).
  * K1 sink → ``foreachBatch`` writing date-partitioned parquet; swap in the
    Power BI REST poster per micro-batch for true push-dataset output
    (chunked ≤10k rows/POST per the public API limits).
  * Trigger: 1-minute micro-batches ≪ the 15-minute SLA
    (docs/quill_dashboard_schema_design_doc.md:185).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.adapter import normalize_webhooks, to_physical_rows
from ..schemas import ALOWARE_BODY_SCHEMA

# Landing-dir JSON shape: one envelope per line {source, body, receivedAt}.
ENVELOPE_JSON_SCHEMA = (
    "source string, headers map<string,string>, body string, receivedAt timestamp"
)


def read_envelope_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """S1/S2: webhook envelopes from a JSON landing directory."""
    return (
        spark.readStream.schema(ENVELOPE_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )


def envelopes_to_webhook_shape(envelopes: DataFrame) -> DataFrame:
    """P1/P2: parse the raw JSON body (shape-tolerant: flat payload or
    {parsedBody:{event,body}} wrapper — aloware.adapter.ts:56-58) into the
    webhook-shaped columns the adapter expressions consume."""
    parsed = envelopes.withColumn("p", F.from_json("body", ALOWARE_BODY_SCHEMA))
    inner = F.coalesce(
        F.col("p.body"),
        F.from_json("p.parsedBody.body", ALOWARE_BODY_SCHEMA["body"].dataType),
    )
    return parsed.select(
        F.col("source"),
        F.coalesce(F.col("p.event"), F.col("p.parsedBody.event")).alias("event_name"),
        inner.getField("id").alias("ext_id"),
        inner.getField("uuid_v4").alias("uuid_v4"),
        inner.getField("direction").alias("direction"),
        inner.getField("type").alias("type_code"),
        inner.getField("created_at").alias("created_at_raw"),
        inner.getField("owner_id").alias("owner_id"),
        inner.getField("user_id").alias("user_id"),
        inner.getField("contact").getField("timezone").alias("tz"),
        F.col("receivedAt"),
    )


def streaming_fact_pipeline(
    envelopes: DataFrame, dedup_ttl_days: int = 14
) -> DataFrame:
    """The full ingest graph on a (possibly streaming) envelope DataFrame:
    normalize (P1-P12) → watermarked cross-request dedup on EventID (D2/D3).

    ``dropDuplicatesWithinWatermark`` keeps state per key until the watermark
    passes ``ttl`` behind the max seen event time — the exact streaming
    equivalent of the reference's 14-day DynamoDB TTL ledger, minus the
    per-row RPCs.
    """
    fact = normalize_webhooks(envelopes_to_webhook_shape(envelopes))
    if fact.isStreaming:
        return fact.withWatermark(
            "EventTime", f"{dedup_ttl_days} days"
        ).dropDuplicatesWithinWatermark(["EventID"])
    # Batch replay of the identical graph: plain dropDuplicates on the key.
    return fact.dropDuplicates(["EventID"])


def start_fact_sink(
    fact_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 60,
    available_now: bool = False,
) -> StreamingQuery:
    """K1 streaming sink: append-mode, date-partitioned parquet via
    foreachBatch (the hook where a Power BI REST poster would plug in).

    ``available_now=True`` drains the backlog then stops — used by tests and
    backfills; the production path triggers every ``trigger_seconds``.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            to_physical_rows(batch_df)
            .write.mode("append")
            .partitionBy("FactDateKey")
            .parquet(output_dir)
        )

    writer = fact_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


# --------------------------------------------------------------------------- #
# Streaming corpus gate (north-star tier under readStream)
# --------------------------------------------------------------------------- #

DOC_JSON_SCHEMA = "doc_id long, text string, lang string, source string, event_time timestamp"


def streaming_corpus_gate(
    spark: SparkSession,
    landing_dir: str,
    dedup_window: str = "14 days",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Documents as a stream: the SAME quality-gate + exact-dedup column
    expressions as the batch corpus tier, compiled under ``readStream``.

    - quality gate: row-local expressions (functions/text.py) — identical
      keep semantics to the batch ``quality_filter`` gates they share code
      with; stateless, so no watermark needed for this stage.
    - exact dedup: ``dropDuplicatesWithinWatermark`` on the normalized
      content hash — the streaming state store plays the ledger role with a
      TTL (= watermark delay), exactly like the ingest pipeline's D3.

    Returns the gated stream; attach any sink (tests use an availableNow
    parquet sink).
    """
    from ..functions import text as T
    from ..operators.dedup import normalize_text

    docs = (
        spark.readStream.schema(DOC_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )
    gated = docs.filter(
        (T.token_count(F.col("text")) >= min_tokens)
        & (T.punct_ratio(F.col("text")) <= max_punct_ratio)
    ).withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
    return gated.withWatermark("event_time", dedup_window).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
