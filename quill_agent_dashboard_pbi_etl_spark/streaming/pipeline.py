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

from pyspark.errors import AnalysisException
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


def start_ledger_gated_fact_sink(
    fact_stream: DataFrame,
    ledger_path: str,
    output_dir: str,
    checkpoint_dir: str,
    ttl_days: int = 14,
    trigger_seconds: int = 60,
    available_now: bool = False,
    now_epoch: int | None = None,
) -> StreamingQuery:
    """K4 under streaming: per-micro-batch atomic ledger gate+mark against an
    EXTERNAL parquet ledger (the reference's DynamoDB cycle verbatim,
    ledger.repo.ts:16-27), then the K1 append sink.

    Why this exists alongside ``dropDuplicatesWithinWatermark``: the state-
    store dedup horizon lives INSIDE the streaming checkpoint — rebuild the
    checkpoint (redeploy, topology change, checkpoint corruption) and the
    stream forgets everything it ever saw. The ledger variant keeps the
    14-day horizon in an external table exactly like the reference, so a
    brand-new stream instance still dedups against history, multiple
    pipelines can share one horizon, and the TTL is enforced by data
    (``expiresAt``) rather than by operator state. Cost: one locked
    gate+append cycle per micro-batch (single-writer per ledger; on a
    Delta/Iceberg catalog, ``ledger_update_auto`` upgrades it to lock-free
    MERGE). Within-batch duplicates are collapsed keep-first before the
    gate, so one micro-batch can never double-mark a key. ``now_epoch``
    freezes the TTL clock for deterministic backfills/replays of historical
    event time (default: wall clock per batch).
    """
    from ..operators.dedup import keep_first, ledger_update_atomic

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        unique = keep_first(
            batch_df, ["EventID"], [F.col("EventTime"), F.col("Notes")]
        )
        survivors = ledger_update_atomic(
            unique,
            ledger_path,
            seen_at=F.col("EventTime"),
            key_col="EventID",
            ttl_days=ttl_days,
            now_epoch=now_epoch,
        )
        (
            to_physical_rows(survivors)
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


def start_streaming_near_dup_gate(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
    available_now: bool = False,
    trigger_seconds: int = 60,
) -> StreamingQuery:
    """Streaming NEAR-dup gate: quality gate + MinHash-LSH suppression per
    micro-batch against an incrementally-built bucket index of every
    previously ACCEPTED document.

    Per batch (``foreachBatch``):

    1. quality gate — the same row-local expressions as the batch
       ``quality_filter`` / ``streaming_corpus_gate``.
    2. band the batch with the SAME ``minhash_band_buckets`` stage the batch
       pipeline uses (operators/dedup.py) — identical banding means a doc
       suppressed here is exactly a doc the batch ``dedup_minhash_lsh`` would
       pair.
    3. history suppression — any batch doc sharing a (band, band_key) bucket
       with an accepted doc is a near-dup of corpus history → dropped. The
       history side is a parquet bucket table under ``state_dir``; the batch
       side is micro-batch-sized, so Spark broadcasts it against the large
       history scan (no history shuffle).
    4. within-batch suppression — greedy keep-lowest-id per bucket: a doc is
       dropped if a smaller-id, non-history-suppressed batch doc shares one
       of its buckets. (Exact dups share ALL buckets, so this subsumes exact
       dedup.) Greedy-per-bucket is deliberately one notch more aggressive
       than the batch path's transitive connected-components clustering —
       the right trade for a gate that must decide per micro-batch without an
       iterative job; banding is already probabilistic candidate generation.
    5. survivors append to ``output_dir``; survivors' bucket rows append to
       ``state_dir``. Both writes go to a ``batch_id=N`` subdirectory with
       mode=overwrite — a replayed micro-batch (checkpoint recovery)
       rewrites its own directory instead of duplicating rows, the standard
       idempotent-``foreachBatch`` pattern.

    State lives OUTSIDE the streaming checkpoint, so the accepted-corpus
    index survives checkpoint resets and is queryable/compactable as a plain
    table. 100 TB posture: the index holds ``bands`` narrow rows per accepted
    doc; compact it periodically and bucket it by (band, band_key) so the
    per-batch join prunes to colliding buckets instead of scanning the full
    index (SPARK bucketed-table join elision); a hot boilerplate bucket is
    AQE skew-join territory, same as the batch path.
    """
    from ..functions import text as T
    from ..operators.dedup import minhash_band_buckets

    docs = (
        spark.readStream.schema(DOC_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )
    gated_stream = docs.filter(
        (T.token_count(F.col("text")) >= min_tokens)
        & (T.punct_ratio(F.col("text")) <= max_punct_ratio)
    )

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch_df = batch_df.persist()
        buckets = None
        try:
            buckets = minhash_band_buckets(
                batch_df, "text", "doc_id", num_hashes, bands, shingle_n
            ).persist()
            try:
                history = sess.read.parquet(state_dir).select(
                    "band", "band_key"
                )
            except AnalysisException:  # first batch: no state yet
                history = sess.createDataFrame([], "band int, band_key string")
            hist_hit = (
                buckets.join(history.distinct(), ["band", "band_key"])
                .select("doc_id")
                .distinct()
            )
            # Buckets of docs that survived history — only these can suppress
            # a within-batch sibling.
            surv_buckets = buckets.join(hist_hit, "doc_id", "left_anti")
            within_hit = (
                surv_buckets.alias("l")
                .join(
                    buckets.alias("r"),
                    on=[
                        F.col("l.band") == F.col("r.band"),
                        F.col("l.band_key") == F.col("r.band_key"),
                        F.col("l.doc_id") < F.col("r.doc_id"),
                    ],
                )
                .select(F.col("r.doc_id").alias("doc_id"))
                .distinct()
            )
            dropped = hist_hit.union(within_hit).distinct()
            keep = batch_df.join(dropped, "doc_id", "left_anti")
            keep.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")
            (
                buckets.join(dropped, "doc_id", "left_anti")
                .write.mode("overwrite")
                .parquet(f"{state_dir}/batch_id={batch_id}")
            )
        finally:  # unpersist even on a failed batch — the stream outlives it
            if buckets is not None:
                buckets.unpersist()
            batch_df.unpersist()

    writer = gated_stream.writeStream.foreachBatch(gate_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_cms_counter_sink(
    keys_stream: DataFrame,
    counters_path: str,
    checkpoint_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    trigger_seconds: int = 60,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming heavy-hitter counters: fold every micro-batch into ONE
    persistent count-min sketch (operators/sketches.py).

    This is the sketch's mergeability doing real work: per batch, the batch's
    counter table (≤ depth×width rows — bounded regardless of key
    cardinality or stream length) is summed into the persisted table and
    rewritten. State is ~32k rows of parquet forever, readable by any batch
    job mid-stream via ``cms_estimate`` — the streaming analog of a metrics
    store that answers "how often did key X occur, ever" without keeping
    per-key state. Exactly-once caveat: a replayed batch double-counts
    (counter merge is not idempotent); at-least-once estimates stay
    overestimates, which preserves the CMS one-sided error contract.
    """
    from ..operators.materialize import pin
    from ..operators.sketches import cms_counters

    counter_schema = "seed int, bucket bigint, cnt bigint"

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_counters = cms_counters(batch_df, key_col, depth, width)
        try:
            prev = spark.read.schema(counter_schema).parquet(counters_path)
        except Exception:  # first batch bootstraps the table
            prev = spark.createDataFrame([], counter_schema)
        merged = pin(  # materialize BEFORE overwriting the path we read from
            batch_counters.unionByName(prev)
            .groupBy("seed", "bucket")
            .agg(F.sum("cnt").alias("cnt")),
            required=True,
        )
        merged.write.mode("overwrite").parquet(counters_path)

    writer = keys_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_hll_distinct_sink(
    keyed_stream: DataFrame,
    sketch_path: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    trigger_seconds: int = 60,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming distinct-counting: one mergeable Datasketches HLL sketch per
    group, persisted and unioned per micro-batch (Spark 4's
    ``hll_sketch_agg`` / ``hll_union_agg`` — the binary sketches merge
    losslessly, unlike ``approx_count_distinct`` whose estimate is terminal).

    State is one ~KB binary per group forever; any batch job can read the
    table mid-stream and answer "distinct agents per metric, ever" via
    :func:`hll_estimates` without touching the raw stream. Replays
    double-insert, but HLL insertion is idempotent per value — exactly-once
    falls out for distinct-counting even under at-least-once delivery (the
    property the CMS counter sink does NOT have).
    """
    from ..operators.materialize import pin

    schema = f"{group_col} string, sketch binary"

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sk = batch_df.groupBy(group_col).agg(
            F.hll_sketch_agg(value_col).alias("sketch")
        )
        try:
            prev = spark.read.schema(schema).parquet(sketch_path)
        except Exception:  # first batch bootstraps the table
            prev = spark.createDataFrame([], schema)
        merged = pin(  # materialize BEFORE overwriting the path we read from
            batch_sk.unionByName(prev)
            .groupBy(group_col)
            .agg(F.hll_union_agg("sketch").alias("sketch")),
            required=True,
        )
        merged.write.mode("overwrite").parquet(sketch_path)

    writer = keyed_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def hll_estimates(spark: SparkSession, sketch_path: str, group_col: str) -> DataFrame:
    """Point-read the persisted HLL table → (group, distinct_estimate)."""
    sk = spark.read.schema(f"{group_col} string, sketch binary").parquet(sketch_path)
    return sk.select(
        F.col(group_col),
        F.hll_sketch_estimate("sketch").alias("distinct_estimate"),
    )
