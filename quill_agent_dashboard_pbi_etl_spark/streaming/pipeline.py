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

import time

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.adapter import normalize_webhooks, to_physical_rows
from ..schemas import ALOWARE_BODY_SCHEMA
from .state_store import StateStorage, storage_for

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


# bloom_pregate="auto" enables the per-batch Bloom pre-gate only when the
# micro-batch carries at least this many WITHIN-BATCH-DEDUPED events — the
# rows the gate actually probes (the sink counts `unique`, after
# keep_first). From the r10 flip-point grid (SCALE_LADDER.json
# streaming_ledger_gate.flip_point, min-of-2 with alternated order): at
# the 5.8M-key decade the pre-gate loses 1.66x at 30M raw events/batch
# (~15M deduped at the generator's ~50% duplicate rate) and wins 0.60x at
# 60M raw (~30M deduped) — the floor sits between the measured loss and
# win in DEDUPED terms, the unit the gate's probe cost actually scales
# with. Batches this large are replay/backfill drains by construction;
# SLA-paced triggers never reach it and stay on the plain anti-join.
PREGATE_AUTO_MIN_BATCH_ROWS = 25_000_000

# ...and only when the TTL-live ledger is past the session's broadcast
# threshold. History of this axis (all in SCALE_LADDER.json): the r10 grid
# seemed to show a one-box win at the broadcastable 5.8M-key decade (0.60x
# at 60M events); an executed-plan re-measure proved BOTH grid decades
# broadcast (estimates 19.9/58.8 MB under the 64 MB session threshold —
# `flip_point_mechanism`); a THIRD run of that cell failed to reproduce
# the win (min walls favor exact 82.8 vs 93.8 s); and the past-broadcast
# cell itself (17.47M live keys / ~177 MB estimate, two alternated-order
# passes — `flip_point_auto.vol33pct_seed100pct`) came back NEGATIVE too:
# clean-position walls exact 111.1 s vs pre-gate 180.8 s (1.63x loss) —
# the BATCH gate's r10 sf300 fresh-JVM win (66.9 vs 73.3 s — itself
# demoted r12 to "not reproducible on this box" after bimodal r11/r12
# re-runs, SCALE_LADDER sf300_ab.r10_pair_status) does not transfer
# to the sink, which adds per-batch live pinning, the sizing count, and
# the word-table fold whose bit_or aggregation itself shuffles up to
# k x live rows (a cost the 8x anti-join-cut accounting does not
# include). NET ONE-BOX VERDICT: no measured streaming cell where the
# pre-gate wins — on a single machine leave bloom_pregate=False
# everywhere. "auto" therefore encodes the FABRIC-structural regime, not
# a one-box win predictor: it fires where the anti-join volume cut is
# largest (ledger past broadcast, huge drain batches) for deployments on
# real network fabrics where shuffle bytes are the scarce resource — an
# opt-in for clusters, with the caveat above that the fold's own shuffle
# eats into the cut as live:batch grows.


# Canonical definition moved to operators.dedup (the batch gates need it
# too, and operators must not depend on streaming); aliased here for the
# sink's conf reads and existing importers.
from ..operators.dedup import parse_spark_bytes as _parse_spark_bytes  # noqa: E402


def should_bloom_pregate(
    live_est_bytes: int | None,
    broadcast_threshold_bytes: int | None,
    batch_rows: int | None,
    min_batch_rows: int | None = None,
) -> bool:
    """The measured pre-gate rule as a pure predicate. Enable only when the
    micro-batch is a huge drain (>= min_batch_rows DEDUPED rows, default
    ``PREGATE_AUTO_MIN_BATCH_ROWS``, read at call time so tests can lower
    the floor) AND the TTL-live ledger is past the session's broadcast
    threshold (``live_est_bytes > broadcast_threshold_bytes``; threshold
    <= 0 = broadcast disabled, which counts as not-broadcastable). Past
    that cliff the exact gate sort-merges the whole batch and the
    pre-gate's anti-join volume cut is largest — the FABRIC-structural
    regime this predicate marks for cluster deployments. It is NOT a
    one-box win predictor: every measured one-box streaming cell,
    including the past-broadcast one, is negative-to-tie (see the
    comment block above ``PREGATE_AUTO_MIN_BATCH_ROWS`` for the full
    history). Unknown live estimate -> False (a pure in-memory ledger
    bootstrap is tiny).

    ``batch_rows=None`` means "assume a huge batch": only the live-ledger
    axes are tested. The predicate is monotone in ``batch_rows``, so
    None ≡ +inf — the sink uses it to ask whether the pre-gate COULD fire
    at all before paying the batch-sizing count job."""
    if min_batch_rows is None:
        min_batch_rows = PREGATE_AUTO_MIN_BATCH_ROWS
    if live_est_bytes is None:
        return False
    if batch_rows is not None and batch_rows < min_batch_rows:
        return False
    if broadcast_threshold_bytes is None:
        return False  # unparseable conf: can't judge the cliff, stay exact
    return (
        broadcast_threshold_bytes <= 0
        or live_est_bytes > broadcast_threshold_bytes
    )


def start_ledger_gated_fact_sink(
    fact_stream: DataFrame,
    ledger_path: str,
    output_dir: str,
    checkpoint_dir: str,
    ttl_days: int = 14,
    trigger_seconds: int = 60,
    available_now: bool = False,
    now_epoch: int | None = None,
    storage: StateStorage | None = None,
    bloom_pregate: bool | str = False,
    partition_by_expiry: bool | None = None,
) -> StreamingQuery:
    """K4 under streaming: per-micro-batch atomic ledger gate+mark against an
    EXTERNAL parquet ledger (the reference's DynamoDB cycle verbatim,
    ledger.repo.ts:16-27), then the K1 append sink.

    ``partition_by_expiry`` carries ``sinks.append_ledger``'s three-valued
    contract through unchanged (ADVICE r13 — the flag used to map False to
    "follow existing", making it impossible to ENFORCE flat): ``True``
    keeps the ledger in the expiry-partitioned production layout, every
    per-batch gate scan partition-prunes the expired ``expiryDay=``
    directories at the manifest — the scan the stream pays EVERY trigger —
    and the read-back verify prunes to the ``[day(now), day(now + ttl)]``
    window its claims can live in; ``False`` enforces the flat layout; the
    default ``None`` follows whatever layout the ledger already has (a
    fresh path starts flat). Claims, tags, crash recovery, and the reclaim
    job are layout-independent: the rewrite path
    (``rewrite_ledger_atomic``) preserves the partitioning by re-deriving
    ``expiryDay`` from ``expiresAt``. An explicit ``True``/``False`` that
    contradicts an EXISTING ledger's layout fails loudly at the first
    claim append (``sinks.append_ledger`` raises) rather than mixing
    layouts under one root — Spark reads a mixed root by silently dropping
    the flat rows, which would hide every prior claim from the gate and
    re-admit its duplicates.

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

    Crash safety (effectively-once output): claims are the commit point.
    Each batch CLAIMS its new keys in the ledger tagged ``writer_id =
    <generation>-b<id>`` (the generation id is a uuid persisted in the
    checkpoint dir — see :func:`_generation_id` — so tags are unique across
    stream incarnations AND across pipelines sharing one ledger), then
    derives its survivors by READING BACK the keys its tag owns, and finally
    overwrites its own ``gen=<generation>/batch_id=N`` output subdirectory.
    A retry at any crash point reconstructs the identical survivor set from
    the durable claims (keys it claimed before the crash are still tagged as
    its own — NOT silently dropped as duplicates, which is what a
    mark-then-write sink without tags would do) and the per-batch overwrite
    is idempotent. Across checkpoint replacement: the rebuilt stream's batch
    N carries a fresh generation, so it can neither adopt the old
    incarnation's claims (no duplicate re-emission) nor overwrite the old
    incarnation's committed output — a replayed event lands in exactly the
    one subdirectory whose batch claimed its key, never twice — with ONE
    loss window: a batch that claimed keys and crashed before writing
    output is recoverable only by the SAME incarnation's retry. If the
    checkpoint is rebuilt while such a batch is outstanding, its claims are
    orphaned (live in the ledger under a dead tag) and those events land in
    no output. :func:`reclaim_orphaned_claims` closes that window after the
    fact — it finds dead-tag claims whose output never committed and either
    releases them (the next replay re-admits the events) or re-emits the
    events to a quarantine output; operationally, still prefer draining the
    stream before deleting a checkpoint, or the Delta MERGE ledger path
    (``ledger_update_auto``) where claim+output can share one transactional
    table. Output layout is ``gen=<id>/batch_id=<n>/FactDateKey=<d>/``;
    readers of ``output_dir`` see ``gen``/``batch_id`` as partition columns
    — do not mix differently-laid-out data in one output root.

    ``bloom_pregate="auto"`` is a CLUSTER-FABRIC opt-in that applies the
    structural regime rule per micro-batch: :func:`should_bloom_pregate`
    enables the pre-gate only when the deduped micro-batch carries >=
    ``PREGATE_AUTO_MIN_BATCH_ROWS`` events (one count job over the
    already-pinned batch, paid only when the ledger signal could fire)
    AND the TTL-live ledger's Catalyst plan-size estimate (a driver-side
    stat read, no job) exceeds the session's broadcast threshold — the
    regime where the exact gate sort-merges the whole batch and the
    anti-join volume cut is largest. On a SINGLE machine leave the flag
    False: every measured one-box cell — five decades of them, including
    the past-broadcast 17.5M-key cell — is negative-to-tie for the
    streaming pre-gate (full history in the
    ``PREGATE_AUTO_MIN_BATCH_ROWS`` comment block; the batch operator's
    sf300 win does not transfer because the sink adds per-batch live
    pinning, the sizing count, and the word-table fold's own shuffle).

    ``bloom_pregate=True`` runs the batch Bloom pre-gate
    (:func:`..operators.dedup.ledger_gate_bloom`) in place of the plain
    anti-join inside each micro-batch: the TTL-live ledger folds into a
    Bloom filter sized per batch from the live-key count at 1% fpp, every
    event tests it scan-side, and only the maybes (true duplicates + fpp
    sliver) enter the exact anti-join — same result by construction (no
    false negatives; every maybe re-checks exactly), so claims, tags, and
    crash recovery are untouched. Measured regime (the r10 flip-point grid,
    SCALE_LADDER.json ``streaming_ledger_gate.flip_point`` — per-batch
    volume and live-ledger size decoupled, min-of-2 with alternated order):
    enable ONLY when BOTH hold — the TTL-live ledger has grown to
    millions of keys (the grid flips between its 1.75M- and 5.8M-key
    decades; the executed-plan re-measure shows BOTH still broadcast
    under the session's 64 MB threshold, so the axis is the per-event
    cost of probing a large broadcast hash relation, not a
    broadcast-vs-SMJ flip) AND micro-batches carry tens of millions of
    events (flips positive between 30M and 60M events/batch at the
    5.8M-key decade, 0.60× at 60M). Against a small ledger the probe
    pass is pure added CPU that grows with volume (2.05× loss at 100M
    events over 1.75M keys); at small SLA-paced triggers the per-batch
    fixed costs dominate (2× at sf0.1) — hence the flag rather than a
    default. Its cluster-side value once the ledger genuinely stops
    broadcasting is structural: the anti-join shuffle volume cut holds
    ~8× per batch. Past ``MAX_BLOOM_LITERAL_BITS`` the sizing
    auto-dispatches to the distributed word-table probe exactly like the
    batch operator.
    """
    import math

    from ..operators.dedup import (
        LedgerLock,
        gate_anti_join,
        keep_first,
        ledger_gate_bloom,
        probe_volume_estimate,
    )
    from ..operators.materialize import pin
    from ..sinks import append_ledger, read_ledger, utc_day_of

    if bloom_pregate not in (True, False, "auto"):
        raise ValueError(
            f"bloom_pregate must be True, False or 'auto', got {bloom_pregate!r}"
        )

    sink_ledger_schema = "pk string, seenAt timestamp, expiresAt long, writer_id string"
    gen = _generation_id(checkpoint_dir, storage)  # immutable per incarnation

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        now = now_epoch if now_epoch is not None else int(time.time())
        tag = f"{gen}-b{batch_id}"
        # pin: `unique` is consumed 2× on the exact path (claims anti-join +
        # the survivors semi-join) and 3× on the Bloom path (clean branch,
        # maybe branch, survivors). Without it, every consumer re-executes
        # the batch's full upstream lineage — for a file-source batch that
        # is the ENTIRE JSON parse + normalize + keep_first window again.
        # Measured at the sf100 single-batch drain (100M envelopes): the
        # unpinned Bloom path re-parsed ~30 GB of JSONL three times and ran
        # 744 s vs 330 s exact — lineage cost, not gate cost. The pin is
        # micro-batch-sized; blocks are released by the ContextCleaner when
        # the batch's DataFrames go out of scope. This is a PERF pin
        # (correctness rides on the `claims` pin below), so it honors the
        # session's `spark.graft.pin=none` escape hatch — at tiny SLA-paced
        # triggers the eager checkpoint job is measurable overhead
        # (~2 s/batch at 25k-event batches) while the lineage it saves is
        # pennies.
        unique = pin(
            keep_first(
                batch_df, ["EventID"], [F.col("EventTime"), F.col("Notes")]
            ),
            required=False,
        )
        with LedgerLock(ledger_path):
            try:
                # Partition-prunes expired expiryDay= dirs on the
                # partitioned layout (the scan paid every trigger); the
                # row-level TTL filter below stays authoritative for the
                # boundary day. Flat layout: plain full read, as before.
                ledger = read_ledger(spark, ledger_path, now_epoch=now)
            except Exception:  # first batch bootstraps the ledger
                ledger = spark.createDataFrame([], sink_ledger_schema)
            live = ledger.filter(F.col("expiresAt") >= F.lit(now)).select(
                F.col("pk").alias("EventID")
            )
            use_pregate = bloom_pregate is True
            if bloom_pregate == "auto":
                # The live-side signals are driver-side stat/conf reads (no
                # job); the batch count is one scalar job over blocks the
                # pin above already materialized — pay it only when the
                # live axes could fire at all (batch_rows=None = "assume a
                # huge batch"), so SLA-paced triggers against a small
                # ledger add zero jobs.
                est = probe_volume_estimate(live)
                thresh = _parse_spark_bytes(
                    spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
                )
                if should_bloom_pregate(est, thresh, batch_rows=None):
                    use_pregate = should_bloom_pregate(
                        est, thresh, unique.count()
                    )
            if use_pregate:
                # Bloom pre-gate: identical survivor set (no false
                # negatives; maybes re-check via the exact anti-join inside
                # ledger_gate_bloom), but only the duplicate+fpp sliver of
                # the batch enters the anti-join shuffle. Sized from the
                # live-key count at 1% fpp (bloom_build's formula).
                #
                # pin: the TTL-filtered live key set is consumed 3× on this
                # path (the sizing count here, the word-table fold, and the
                # maybe-side exact anti-join inside ledger_gate_bloom) —
                # without it each consumer re-scans and re-filters the full
                # ledger, doubling the per-batch fixed cost that already
                # bounds the pre-gate's payoff regime. Passing the pinned
                # frame through `live=` makes all three share one
                # materialization. PERF pin (the gate is correct with full
                # lineage), so it honors `spark.graft.pin=none`.
                live = pin(live, required=False)
                live_n = live.count()
                num_bits = max(1 << 16, int(1.44 * live_n * math.log2(1 / 0.01)))
                new_events = ledger_gate_bloom(
                    unique,
                    ledger,
                    key_col="EventID",
                    now_epoch=now,
                    num_bits=num_bits,
                    # the pre-gate only pays off on huge batches, where the
                    # literal probe's per-row CPU dominates — always use the
                    # word-table probe here (measured: 31-79 s literal vs
                    # 9.9 s bucketed at 50M probes, identical filter).
                    probe="bucketed",
                    live=live,
                )
            else:
                # Exact gate through the ONE join-shape selector shared
                # with the batch gates (directive r13-3): the BROADCAST-
                # FLIP pathology — Spark can only build the RIGHT side of
                # a left-anti join, so a live-ledger estimate landing
                # UNDER the broadcast threshold while being the LARGER
                # side hash-builds millions of live keys per trigger
                # (measured ~5.7 s/trigger over a 2x2-reproduced 8-batch
                # drain on the pruned partitioned layout;
                # SCALE_LADDER.json streaming_ledger_layout +
                # small_batch_gate) — auto-inverts to
                # anti_join_small_left in exactly that regime; outside it
                # the plain anti-join stands (the inverted shape loses
                # 0.78× against a healthy sort-merge join). Estimates are
                # driver-side plan stats (no job); when either is
                # unavailable the plain shape stands. See
                # operators.dedup.gate_anti_join.
                new_events = gate_anti_join(unique, live, "EventID")
            # pin: the claim set is consumed twice (emptiness check + the
            # append) — materialize the micro-batch-sized result once
            # instead of running the ledger anti-join twice under the lock.
            claims = pin(
                new_events
                .select(
                    F.col("EventID").alias("pk"),
                    F.col("EventTime").alias("seenAt"),
                    # expiresAt is PROCESSING time + TTL, matching the gate's
                    # wall-clock filter and the reference's checkAndMark
                    # (ledger.repo.ts:12, `now + DYNAMO_TTL_DAYS`): a claim
                    # protects for ttl_days from when it was MADE. Deriving
                    # it from event time would pre-expire claims for
                    # late/backfill data older than the TTL, silently
                    # re-admitting their duplicates in later micro-batches.
                    F.lit(now + ttl_days * 86400).cast("long").alias("expiresAt"),
                    F.lit(tag).alias("writer_id"),
                )
                .dropDuplicates(["pk"]),
                required=True,
            )
            # An all-duplicate batch claims nothing — skip the append so a
            # long-running stream doesn't shed one empty parquet file set
            # per trigger.
            if not claims.isEmpty():
                # The sink's three-valued flag passes through verbatim:
                # None follows the existing layout, an explicit True/False
                # establishes-or-enforces it (append_ledger raises on a
                # contradiction).
                append_ledger(
                    claims,
                    ledger_path,
                    partition_by_expiry=partition_by_expiry,
                )
        # Verify outside the lock: survivors = the keys THIS tag owns in the
        # durable ledger — replay-stable even if we crashed mid-cycle above.
        # Deliberately NO ignoreMissingFiles here: a concurrent locked
        # rewrite (reclaim / flat compaction rename-swap) racing this
        # unlocked read must FAIL the batch — the retry replays cleanly —
        # never read an empty ledger and commit an empty output WITH
        # _SUCCESS while the claims stand (that would suppress the events
        # forever). Partitioned compaction can't race this read into
        # missing files either way: it only drops days strictly before
        # today, and this read prunes to [today, today+ttl].
        claimed_src = spark.read.schema(sink_ledger_schema).parquet(
            ledger_path
        )
        if "expiryDay" in claimed_src.columns:
            # RANGE prune, not equality on day(now + ttl): a crash-replay
            # of a batch that already appended claims recomputes `now`,
            # and if the retry crossed a UTC midnight the recomputed
            # day(now + ttl) is one day PAST the day the first attempt's
            # claims landed in — an equality prune would read back zero
            # claims for this tag and commit an EMPTY output with
            # _SUCCESS while the claims stand, suppressing the events
            # forever (and reclaim_orphaned_claims would skip the tag:
            # its output looks committed). Any claim this tag still owns
            # expires strictly in the future, so >= day(now) keeps every
            # replay-relevant claim regardless of midnight crossings;
            # <= day(now + ttl) bounds the scan to the TTL window (an
            # earlier attempt's expiresAt = now1 + ttl <= now + ttl, so
            # the upper bound can never exclude this tag's claims).
            claimed_src = claimed_src.filter(
                (F.col("expiryDay") >= F.lit(utc_day_of(now)).cast("date"))
                & (
                    F.col("expiryDay")
                    <= F.lit(utc_day_of(now + ttl_days * 86400)).cast("date")
                )
            )
        claimed = claimed_src.filter(F.col("writer_id") == tag).select(
            F.col("pk").alias("EventID")
        )
        survivors = unique.join(claimed, "EventID", "left_semi")
        (
            to_physical_rows(survivors)
            .write.mode("overwrite")
            .partitionBy("FactDateKey")
            .parquet(f"{output_dir}/gen={gen}/batch_id={batch_id}")
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


def streaming_quality_drift(
    spark: SparkSession,
    landing_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Quality-filter DRIFT monitor: per (source, event-time window), the
    keep-rate of THE corpus quality gate — the monitoring companion the
    batch ``quality_filter`` docstring promises ("filter-rate drift per
    source/date is monitorable").

    The keep decision is ``functions.text.quality_keep_prepped`` — the SAME
    expression dict the batch ``quality_filter`` / ``quality_drift_by_source``
    queries enforce, imported, not re-stated, so the monitored rate and the
    enforced rate cannot diverge (a parity test lands identical documents as
    files and as a stream and asserts identical per-source rates).

    Emits (window_start, window_end, source, n_docs, n_kept, keep_rate) as
    closed tumbling windows (watermark + append mode → each window emits
    exactly once). A keep-rate cliff on one source is the canonical early
    signal of an upstream format change or crawler regression — this surfaces
    it per micro-batch without a second scan of the corpus: the gate
    predicate is evaluated once as a boolean column and aggregated, the
    documents themselves never shuffle (only per-window counters do).
    """
    from ..functions import text as T

    docs = (
        spark.readStream.schema(DOC_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )
    keep = T.quality_keep_prepped().cast("long")
    return (
        T.with_text_prep(docs)
        .withColumn("keep", keep)
        .withWatermark("event_time", watermark_delay)
        .groupBy(F.window("event_time", window_duration), F.col("source"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.round(F.avg("keep"), 6).alias("keep_rate"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "source",
            "n_docs",
            "n_kept",
            "keep_rate",
        )
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


_GENERATION_MARKER = "__spark_graft_generation"


def _generation_id(checkpoint_dir: str, storage: StateStorage | None = None) -> str:
    """Stable unique id for THIS incarnation of a stream, persisted as a
    marker object inside the checkpoint directory. Properties the sinks rely
    on: (a) retries within one incarnation see the same id (the marker
    survives restarts that keep the checkpoint); (b) an in-place checkpoint
    rebuild (rm -rf + restart at the SAME path) deletes the marker, so the
    rebuilt stream gets a FRESH id — batch numbers restarting at 0 can never
    masquerade as retries of the old incarnation's batches; (c) two
    pipelines never share an id (distinct checkpoint dirs → distinct
    markers).

    All control-state I/O goes through :class:`StateStorage`
    (``state_store.py``): local checkpoints default to the POSIX backend,
    URI-schemed ones raise until a backend for the scheme is passed — the
    marker must live WITH the checkpoint, never on a driver-local path that
    neither fails over nor gets deleted with the real checkpoint.

    Concurrent-writer safe (first writer wins) and never-empty: the backend's
    ``put_if_absent`` publishes the whole value atomically (POSIX impl:
    write-temp + hard-link), and the value RETURNED is always re-read from
    the store after the create attempt, never the locally generated one.
    """
    import uuid

    storage = storage or storage_for(checkpoint_dir)
    storage.ensure_dir(checkpoint_dir)
    marker = f"{checkpoint_dir.rstrip('/')}/{_GENERATION_MARKER}"
    storage.put_if_absent(marker, uuid.uuid4().hex[:12])
    val = (storage.get_text(marker) or "").strip()
    if not val:
        raise RuntimeError(f"empty generation marker at {marker}")
    return val


# --------------------------------------------------------------------------- #
# Ledger maintenance: reclaim claims orphaned by checkpoint replacement
# --------------------------------------------------------------------------- #

# The ledger-gated sink's claim tags: <12-hex generation id>-b<batch id>.
# Rows whose writer_id does not match (batch ledger_update rows, rows
# already retagged "reclaimed:<tag>") are never reclaim candidates.
_SINK_TAG_RE = r"^([0-9a-f]{12})-b(\d+)$"
_RECLAIMED_PREFIX = "reclaimed:"


def _live_generations(
    checkpoint_dirs, storage: StateStorage | None = None
) -> set[str]:
    """Generation ids of the LIVE stream incarnations: the marker value in
    each listed checkpoint dir (read-only — never creates a marker the way
    :func:`_generation_id` does). A dir without a marker contributes
    nothing: its stream has never started a ledger-gated sink, so no claims
    can carry its identity."""
    gens: set[str] = set()
    for d in checkpoint_dirs:
        st = storage or storage_for(d)
        val = (st.get_text(f"{d.rstrip('/')}/{_GENERATION_MARKER}") or "").strip()
        if val:
            gens.add(val)
    return gens


def reclaim_orphaned_claims(
    spark: SparkSession,
    ledger_path: str,
    output_dir: str,
    live_checkpoint_dirs=(),
    mode: str = "release",
    events: DataFrame | None = None,
    quarantine_dir: str | None = None,
    storage: StateStorage | None = None,
    allow_partial: bool = False,
) -> DataFrame:
    """Maintenance job closing the ledger-gated sink's one loss window
    (:func:`start_ledger_gated_fact_sink` crash-safety docstring): a batch
    that CLAIMED keys and died before committing output, followed by a
    checkpoint replacement, leaves its claims live in the ledger under a
    dead generation tag — the events are gated out of every future replay
    yet landed in no output.

    An orphaned claim is a ledger row whose ``writer_id`` tag (a) belongs
    to no generation in ``live_checkpoint_dirs`` (the marker each live
    stream persists — a live generation's claimed-but-unwritten batch is
    that incarnation's own retry to recover, never ours to touch) and (b)
    has no committed output: Spark's commit protocol stamps ``_SUCCESS``
    in ``output_dir/gen=<g>/batch_id=<n>`` only after the batch's
    overwrite completes, so its absence is exactly "died before writing".
    Uncommitted partial output files under an orphaned tag's directory are
    deleted (they are protocol garbage a raw parquet reader would
    otherwise surface) — immediately in release mode, but in quarantine
    mode only AFTER the coverage gate passes: on a shortfall raise those
    partials are the last on-disk trace of the uncovered events, so a
    raise deletes nothing.

    ``mode="release"`` deletes the orphaned claim rows: the next replay of
    the source through the (new-generation) stream re-admits those events
    exactly once — the natural recovery when the source is replayable.
    ``mode="quarantine"`` re-emits the events instead: ``events`` (the
    replayable source re-run through the batch ingest graph — normalized
    facts carrying at least the physical row columns, unique per EventID)
    is joined to the orphaned keys and written to
    ``quarantine_dir/reclaim_tag=<tag>/`` for operator triage, then the
    claims are RETAGGED ``reclaimed:<tag>`` — still protective (the gate
    keeps suppressing those keys, so nothing double-emits) but no longer
    orphan candidates. Both modes are idempotent: re-running after a crash
    at any point re-derives the same orphan set and the quarantine write
    is a per-tag dynamic-partition overwrite that carries forward any
    previously-quarantined rows of the re-identified tags, so a reclaimed
    event lands in quarantine exactly once.

    Quarantine mode VERIFIES coverage before it retags: every orphaned pk
    must be present in ``events`` (the contract says the replayable source
    re-supplies them — an operator re-running with a truncated source
    would otherwise retag claims whose events landed NOWHERE, turning the
    loss invisible). On a shortfall the default is to raise ``ValueError``
    with the uncovered count and sample keys, leaving the ledger, the
    quarantine dir AND the orphans' partial output untouched so a later
    run with a fuller source can still reclaim. Under
    ``allow_partial=True`` only the COVERED claim rows are retagged and
    quarantined; uncovered claims keep their dead tag and remain orphan
    candidates (the shortfall is logged). A tag covered incrementally
    across such runs accumulates: rows quarantined by an earlier run that
    the current source does not re-supply are carried forward through the
    partition overwrite (new rows win per EventID), so the fuller-source
    rerun this contract advertises extends the triage records instead of
    clobbering them.

    The ledger rewrite (a filter/retag needs row deletion parquet cannot
    do in place) goes through ``operators.dedup.rewrite_ledger_atomic`` —
    a full scan → scratch dir → two-rename swap under the ``LedgerLock``,
    with every crash point recoverable by
    ``finish_interrupted_ledger_swap`` at the next run — never
    delete-then-rewrite at the live path. Claims appended by
    a concurrent (locked) sink between orphan identification and the
    rewrite are preserved: the rewrite re-reads the ledger under the lock
    and only drops/retags the identified tags, which no live writer can
    ever re-issue (generation ids are unique per incarnation). Run it with
    the FULL list of live checkpoint dirs for every pipeline sharing the
    ledger — omitting one makes its in-flight batch look orphaned. POSIX
    ledger paths only (the rename swap); on an object store use the Delta
    MERGE ledger (``ledger_update_auto``) where claim+output share one
    transactional table and this window does not exist.

    Returns the claim rows actually reclaimed (pk, seenAt, expiresAt,
    writer_id), materialized before the rewrite — all identified orphans
    in release mode / full-coverage quarantine, only the covered rows
    under ``allow_partial=True``. Driver-side state is the distinct dead
    TAG list (generations × batches — operations-scale, never data-scale;
    the claims themselves stay distributed).
    """
    from ..operators.dedup import (
        LedgerLock,
        finish_interrupted_ledger_swap,
        rewrite_ledger_atomic,
    )
    from ..operators.materialize import pin

    if mode not in ("release", "quarantine"):
        raise ValueError(f"mode must be 'release' or 'quarantine', got {mode!r}")
    if mode == "quarantine" and (events is None or quarantine_dir is None):
        raise ValueError("mode='quarantine' requires events= and quarantine_dir=")
    if "://" in ledger_path:
        raise NotImplementedError(
            "reclaim_orphaned_claims rewrites the ledger via a POSIX rename "
            "swap; for object-store ledgers use the Delta/Iceberg MERGE "
            "ledger (ledger_update_auto), which closes this loss window "
            "transactionally instead"
        )

    ledger_schema = "pk string, seenAt timestamp, expiresAt long, writer_id string"
    live_gens = _live_generations(live_checkpoint_dirs, storage)
    out_storage = storage or storage_for(output_dir)

    with LedgerLock(ledger_path):
        finish_interrupted_ledger_swap(ledger_path)
    try:
        from ..sinks import ledger_is_partitioned

        reader = spark.read.schema(ledger_schema)
        if ledger_is_partitioned(ledger_path):
            # This unlocked read races compact_ledger's locked partition
            # drops; a vanished expiryDay= dir held only fully-expired
            # claims, which no longer gate anything (their events re-admit
            # on replay), so skipping its files is semantically exact —
            # the same argument as sinks.read_ledger.
            reader = reader.option("ignoreMissingFiles", "true")
        ledger = reader.parquet(ledger_path)
    except Exception:  # no ledger yet — nothing to reclaim
        return spark.createDataFrame([], ledger_schema)
    if "expiryDay" in ledger.columns:  # expiry-partitioned layout
        ledger = ledger.drop("expiryDay")

    # Dead-generation sink tags, then keep only those without committed
    # output. The distinct-tag collect is bounded driver-side state.
    tagged = ledger.withColumn(
        "__gen", F.regexp_extract("writer_id", _SINK_TAG_RE, 1)
    ).withColumn("__bid", F.regexp_extract("writer_id", _SINK_TAG_RE, 2))
    dead = tagged.filter(F.col("__gen") != "")
    if live_gens:
        dead = dead.filter(~F.col("__gen").isin(sorted(live_gens)))
    cand = [
        (r["writer_id"], r["__gen"], r["__bid"])
        for r in dead.select("writer_id", "__gen", "__bid").distinct().collect()
    ]
    orphan_tags = []
    for tag, g, bid in sorted(cand):
        batch_out = f"{output_dir.rstrip('/')}/gen={g}/batch_id={bid}"
        if "_SUCCESS" not in out_storage.list_dir(batch_out):
            orphan_tags.append(tag)
    if not orphan_tags:
        return spark.createDataFrame([], ledger_schema)

    # Materialize the orphan rows BEFORE any rewrite touches the files
    # beneath the plan (required pin: correctness, not perf).
    orphans = pin(
        ledger.filter(F.col("writer_id").isin(orphan_tags)), required=True
    )

    def _gc_partial_output(tags) -> None:
        # GC the orphans' uncommitted partial output (no _SUCCESS by
        # definition) so raw readers of output_dir never see half a batch.
        # This runs BEFORE the ledger rewrite: deleting partial files never
        # creates _SUCCESS, so the orphan set stays re-derivable — a crash
        # anywhere after this point still re-identifies the same tags on
        # the next run. The reverse order (rewrite first) would leak the
        # partial files permanently: once the tags are dropped/retagged,
        # nothing re-derives the GC list.
        for tag in tags:
            g, _, bid = tag.partition("-b")
            out_storage.delete_tree(
                f"{output_dir.rstrip('/')}/gen={g}/batch_id={bid}"
            )

    covered = None
    if mode == "release":
        _gc_partial_output(orphan_tags)
    else:
        # Idempotent re-emission: per-tag dynamic-partition overwrite, so a
        # crash-rerun rewrites the same partitions instead of appending.
        keys = orphans.select(
            F.col("pk").alias("EventID"), F.col("writer_id").alias("reclaim_tag")
        )
        matched = pin(
            to_physical_rows(events)
            .dropDuplicates(["EventID"])
            .join(keys, "EventID"),
            required=True,
        )
        # Coverage gate: an orphan pk the re-supplied source did NOT carry
        # must not be retagged — retagging with zero quarantine rows would
        # suppress the key forever with no triage record. Checked before
        # anything is written OR deleted: a raise leaves ledger, quarantine
        # AND the orphans' partial output files untouched — in exactly the
        # truncated-source scenario this gate detects, those partials are
        # the only remaining on-disk trace of the uncovered events, so the
        # GC below is deferred until the gate passes (release mode GCs
        # immediately: the replay source is the recovery there).
        covered = matched.select(
            F.col("EventID").alias("pk"),
            F.col("reclaim_tag").alias("writer_id"),
        ).distinct()
        uncovered = pin(
            orphans.join(covered, ["pk", "writer_id"], "left_anti"),
            required=True,
        )
        n_uncovered = uncovered.count()
        if n_uncovered:
            sample = [r.pk for r in uncovered.select("pk").limit(5).collect()]
            if not allow_partial:
                raise ValueError(
                    f"quarantine shortfall: {n_uncovered} orphaned claim(s) "
                    f"have no matching EventID in the re-supplied events "
                    f"source (sample pks: {sample}); nothing was retagged. "
                    f"Re-run with a fuller source, or pass "
                    f"allow_partial=True to reclaim only the covered claims."
                )
            import warnings

            warnings.warn(
                f"reclaim_orphaned_claims: allow_partial — leaving "
                f"{n_uncovered} uncovered claim(s) as orphan candidates "
                f"(sample pks: {sample})",
                stacklevel=2,
            )
        # GC only the tags whose every claim is covered this run: a tag
        # with uncovered claims keeps its partial output — it is the last
        # on-disk trace of those events and they are still advertised as
        # reclaimable by a later fuller-source run (deleting it here would
        # contradict the shortfall contract above). The distinct-tag
        # collect is operations-scale (dead tags), never data-scale.
        if n_uncovered:
            uncovered_tags = {
                r.writer_id
                for r in uncovered.select("writer_id").distinct().collect()
            }
            _gc_partial_output([t for t in orphan_tags if t not in uncovered_tags])
        else:
            _gc_partial_output(orphan_tags)
        # A tag can be quarantined INCREMENTALLY across runs (allow_partial
        # run 1 covers some pks; a later run with a fuller source covers
        # more — the uncovered rows kept their dead tag, so the tag is
        # re-identified). The dynamic overwrite replaces whole reclaim_tag=
        # partitions, so carry forward any previously-quarantined rows of
        # these tags that this run's source did not re-supply — otherwise
        # the rerun the docstring advertises would destroy run 1's triage
        # records. New rows win on (EventID, reclaim_tag); the union is
        # pinned because the write overwrites the very files it was read
        # from.
        to_write = matched
        try:
            existing = spark.read.parquet(quarantine_dir).filter(
                F.col("reclaim_tag").isin(orphan_tags)
            )
        except Exception:  # first quarantine write at this dir
            existing = None
        if existing is not None:
            carried = existing.join(
                matched.select("EventID", "reclaim_tag"),
                ["EventID", "reclaim_tag"],
                "left_anti",
            )
            to_write = pin(matched.unionByName(carried), required=True)
        (
            to_write.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("reclaim_tag")
            .parquet(quarantine_dir)
        )

    # The rewrite re-reads the ledger under the lock: claims appended since
    # identification are preserved verbatim (their tags are live by
    # construction — no live writer can ever re-issue a dead tag).
    if mode == "release":
        def _transform(current: DataFrame) -> DataFrame:
            return current.filter(~F.col("writer_id").isin(orphan_tags))
    else:
        # Retag per-ROW against the covered (pk, writer_id) pairs — an
        # uncovered claim keeps its dead tag and stays reclaimable. The
        # covered side is pinned (localCheckpoint), so the join inside the
        # locked rewrite never re-reads the ledger files being swapped.
        cov_marked = covered.withColumn("__cov", F.lit(True))

        def _transform(current: DataFrame) -> DataFrame:
            return (
                current.join(cov_marked, ["pk", "writer_id"], "left")
                .withColumn(
                    "writer_id",
                    F.when(
                        F.col("__cov"),
                        F.concat(F.lit(_RECLAIMED_PREFIX), F.col("writer_id")),
                    ).otherwise(F.col("writer_id")),
                )
                .select("pk", "seenAt", "expiresAt", "writer_id")
            )
    rewrite_ledger_atomic(spark, ledger_path, _transform, schema=ledger_schema)

    if mode == "quarantine":
        return pin(
            orphans.join(covered, ["pk", "writer_id"], "left_semi"),
            required=True,
        )
    return orphans


def _read_latest_state(
    spark: SparkSession,
    state_root: str,
    schema: str,
    storage: StateStorage | None = None,
):
    """(DataFrame, version, batch_tag) of the newest COMPLETE snapshot under
    ``state_root`` (a ``v=N`` dir is complete iff its ``_BATCH-<tag>`` marker
    exists — the marker is stamped only after the parquet commit). Empty
    DataFrame / version 0 / no tag when no snapshot exists. Listing goes
    through :class:`StateStorage`; the parquet payload goes through Spark —
    the versioned-snapshot protocol is the point, not the FS calls."""
    storage = storage or storage_for(state_root)
    root = state_root.rstrip("/")
    complete = []
    for d in storage.list_dir(root):
        if not d.startswith("v="):
            continue
        markers = [
            m for m in storage.list_dir(f"{root}/{d}") if m.startswith("_BATCH-")
        ]
        if markers:
            complete.append((int(d[2:]), markers[0][len("_BATCH-"):]))
    if not complete:
        return spark.createDataFrame([], schema), 0, None
    ver, tag = max(complete)
    df = spark.read.schema(schema).parquet(f"{root}/v={ver}")
    return df, ver, tag


def _commit_state_version(
    df: DataFrame,
    state_root: str,
    version: int,
    batch_tag: str,
    keep: int = 3,
    storage: StateStorage | None = None,
) -> None:
    """Commit ``df`` as snapshot ``v=<version>``: write the parquet, stamp
    the ``_BATCH-<tag>`` completeness marker LAST, then GC snapshots older
    than the newest ``keep``. A crash at ANY point leaves the previous
    complete snapshot untouched — nothing ever overwrites or deletes it
    until the new one is fully committed — which is the crash window a
    read-then-overwrite-same-path design cannot close (delete-then-die →
    the retry silently bootstraps from empty)."""
    storage = storage or storage_for(state_root)
    root = state_root.rstrip("/")
    dest = f"{root}/v={version}"
    df.write.mode("overwrite").parquet(dest)
    storage.put_marker(f"{dest}/_BATCH-{batch_tag}")
    versions = sorted(
        int(d[2:]) for d in storage.list_dir(root) if d.startswith("v=")
    )
    for old in versions[:-keep]:
        storage.delete_tree(f"{root}/v={old}")


def read_cms_counters(
    spark: SparkSession, counters_path: str, storage: StateStorage | None = None
) -> DataFrame:
    """Latest committed CMS counter snapshot (pair with
    ``sketches.cms_estimate``)."""
    df, _, _ = _read_latest_state(
        spark, counters_path, "seed int, bucket bigint, cnt bigint", storage
    )
    return df


def start_cms_counter_sink(
    keys_stream: DataFrame,
    counters_path: str,
    checkpoint_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    trigger_seconds: int = 60,
    available_now: bool = False,
    storage: StateStorage | None = None,
) -> StreamingQuery:
    """Streaming heavy-hitter counters: fold every micro-batch into ONE
    persistent count-min sketch (operators/sketches.py).

    This is the sketch's mergeability doing real work: per batch, the batch's
    counter table (≤ depth×width rows — bounded regardless of key
    cardinality or stream length) is summed into the persisted table. State
    is ~32k rows of parquet forever, readable by any batch job mid-stream via
    :func:`read_cms_counters` + ``cms_estimate`` — the streaming analog of a
    metrics store that answers "how often did key X occur, ever" without
    keeping per-key state.

    Crash safety: state commits as VERSIONED snapshots (`v=N` dirs whose
    completeness marker is stamped last — see :func:`_commit_state_version`),
    so a crash mid-write can never destroy the accumulated history the way a
    same-path overwrite would (delete-then-die → silently bootstrap empty).
    A same-generation retry of an already-committed batch is a no-op (the
    latest version remembers which batch built it); a cross-generation
    replay still double-counts — at-least-once estimates stay OVERestimates,
    preserving the CMS one-sided error contract.
    """
    from ..operators.sketches import cms_counters

    counter_schema = "seed int, bucket bigint, cnt bigint"
    # Batch tags bind to the INCARNATION identity (uuid marker inside the
    # checkpoint dir): a same-incarnation retry of batch N carries the same
    # tag (→ no-op), while batch N of a rebuilt checkpoint — even at the
    # same path — gets a fresh generation and folds.
    gen = _generation_id(checkpoint_dir, storage)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev, ver, tag = _read_latest_state(
            spark, counters_path, counter_schema, storage
        )
        if tag == f"{gen}-b{batch_id}":
            return  # retry of an already-committed batch — idempotent no-op
        merged = (
            cms_counters(batch_df, key_col, depth, width)
            .unionByName(prev)
            .groupBy("seed", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        _commit_state_version(
            merged, counters_path, ver + 1, f"{gen}-b{batch_id}", storage=storage
        )

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
    storage: StateStorage | None = None,
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
    property the CMS counter sink does NOT have). State persists as the same
    crash-safe versioned snapshots as the CMS sink.
    """
    schema = f"{group_col} string, sketch binary"
    gen = _generation_id(checkpoint_dir, storage)  # see the CMS sink's note

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev, ver, tag = _read_latest_state(spark, sketch_path, schema, storage)
        if tag == f"{gen}-b{batch_id}":
            return  # retry of an already-committed batch — idempotent no-op
        merged = (
            batch_df.groupBy(group_col)
            .agg(F.hll_sketch_agg(value_col).alias("sketch"))
            .unionByName(prev)
            .groupBy(group_col)
            .agg(F.hll_union_agg("sketch").alias("sketch"))
        )
        _commit_state_version(
            merged, sketch_path, ver + 1, f"{gen}-b{batch_id}", storage=storage
        )

    writer = keyed_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def hll_estimates(
    spark: SparkSession,
    sketch_path: str,
    group_col: str,
    storage: StateStorage | None = None,
) -> DataFrame:
    """Point-read the latest committed HLL snapshot →
    (group, distinct_estimate)."""
    sk, _, _ = _read_latest_state(
        spark, sketch_path, f"{group_col} string, sketch binary", storage
    )
    return sk.select(
        F.col(group_col),
        F.hll_sketch_estimate("sketch").alias("distinct_estimate"),
    )
