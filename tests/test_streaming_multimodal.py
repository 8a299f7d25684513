"""Streaming pipeline (S1/S2 + watermarked dedup + foreachBatch sink) and
multimodal column plumbing."""

from __future__ import annotations

import json

import pytest

from quill_agent_dashboard_pbi_etl_spark.functions.multimodal import (
    extract_features,
    synthesize_assets_from_documents,
)
from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
    read_envelope_stream,
    start_fact_sink,
    streaming_fact_pipeline,
)


def _envelope(eid, event="outbound_call", created="2024-01-15T03:00:00", tz="UTC", wrapped=False):
    body = {
        "id": eid,
        "direction": 2,
        "type": 1,
        "created_at": created,
        "owner_id": 42,
        "contact": {"timezone": tz},
    }
    payload = (
        {"parsedBody": {"event": event, "body": json.dumps(body)}}
        if wrapped
        else {"event": event, "body": body}
    )
    return {
        "source": "ALOWARE",
        "body": json.dumps(payload),
        "receivedAt": "2024-01-15T12:00:00.000Z",
    }


def test_streaming_ingest_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "fact"
    ckpt = tmp_path / "ckpt"

    # batch 1: two events + one duplicate id; one wrapped payload shape
    with open(landing / "b1.json", "w") as f:
        for env in (_envelope(1), _envelope(1), _envelope(2, wrapped=True)):
            f.write(json.dumps(env) + "\n")

    stream = read_envelope_stream(spark, str(landing))
    assert stream.isStreaming
    fact = streaming_fact_pipeline(stream)
    q = start_fact_sink(fact, str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)

    rows = {r.EventID for r in spark.read.parquet(str(out)).collect()}
    assert rows == {"ALOWARE:1", "ALOWARE:2"}

    # batch 2: replay of id 1 (cross-request duplicate) + a new id 3 —
    # the state store must drop the replay.
    with open(landing / "b2.json", "w") as f:
        for env in (_envelope(1), _envelope(3)):
            f.write(json.dumps(env) + "\n")
    q = start_fact_sink(
        streaming_fact_pipeline(read_envelope_stream(spark, str(landing))),
        str(out),
        str(ckpt),
        available_now=True,
    )
    q.awaitTermination(120)
    df = spark.read.parquet(str(out))
    assert df.count() == 3  # no duplicate rows appended
    assert {r.EventID for r in df.collect()} == {"ALOWARE:1", "ALOWARE:2", "ALOWARE:3"}
    # date partitioning by business date key (read back via Spark's partition
    # type inference as a date)
    assert {str(r.FactDateKey) for r in df.collect()} == {"2024-01-15"}


def test_batch_replay_same_graph(spark):
    import datetime as dt

    envs = spark.createDataFrame(
        [
            ("ALOWARE", json.dumps({"event": "outbound_call", "body": {"id": 9, "owner_id": 1}}), dt.datetime(2024, 1, 15, 12)),
            ("ALOWARE", json.dumps({"event": "outbound_call", "body": {"id": 9, "owner_id": 1}}), dt.datetime(2024, 1, 15, 12)),
        ],
        "source string, body string, receivedAt timestamp",
    )
    out = streaming_fact_pipeline(envs).collect()
    assert len(out) == 1
    assert out[0].EventID == "ALOWARE:9"


def test_multimodal_feature_extraction(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "alpha")],
        "doc_id long, text string",
    )
    assets = synthesize_assets_from_documents(docs)
    assert dict(assets.dtypes)["content"] == "binary"

    feats = extract_features(assets)
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 4
    assert rows[0].modality == "image" and rows[0].frames_sampled == 1
    assert rows[1].modality == "audio"
    assert rows[0].feat_dim == 8
    assert 0.0 <= rows[0].feat_mean <= 1.0
    # deterministic: same payload → same hash/features
    assert rows[0].content_sha256 == rows[3].content_sha256
    assert rows[0].byte_len == len(b"alpha")


def test_stateful_session_close(spark, tmp_path):
    """applyInPandasWithState gap sessions: emitted exactly once, on gap-close
    (in-batch and cross-batch) and on watermark timeout."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.streaming.stateful import close_gap_sessions

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "sessions"
    ckpt = tmp_path / "ckpt"

    def run_batch():
        from quill_agent_dashboard_pbi_etl_spark.functions.adapter import normalize_webhooks
        from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
            envelopes_to_webhook_shape,
        )

        stream = read_envelope_stream(spark, str(landing))
        # Sessionization is its own consumer of the normalized stream (the
        # dedup stage's 14-day watermark would stall session timeouts).
        fact = normalize_webhooks(envelopes_to_webhook_shape(stream))
        sessions = close_gap_sessions(fact, gap_minutes=30)

        def write(df, _bid):
            df.write.mode("append").parquet(str(out))

        q = sessions.writeStream.foreachBatch(write).outputMode("update").option(
            "checkpointLocation", str(ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(180)

    # Batch 1 — agent 42: 12:00, 12:10, then 14:00 (gap > 30 min closes the
    # first session in-batch); agent 7: a single 12:05 event (stays open).
    with open(landing / "b1.json", "w") as f:
        for eid, created, owner in (
            (1, "2024-01-15T12:00:00", 42),
            (2, "2024-01-15T12:10:00", 42),
            (3, "2024-01-15T14:00:00", 42),
            (4, "2024-01-15T12:05:00", 7),
        ):
            env = _envelope(eid, created=created)
            body = _json.loads(env["body"])
            body["body"]["owner_id"] = owner
            env["body"] = _json.dumps(body)
            f.write(_json.dumps(env) + "\n")
    run_batch()

    got = {
        (r.AgentID, str(r.session_start), r.n_events, r.first_event, r.last_event)
        for r in spark.read.parquet(str(out)).collect()
    }
    # The gap inside batch 1 closes agent 42's first session; the trailing
    # no-data micro-batch advances the watermark to 13:50, which also times
    # out agent 7's 12:05 session (timeout 12:35). Agent 42's open 14:00
    # session (timeout 14:30) survives in state.
    assert got == {
        ("42", "2024-01-15 12:00:00", 2, "ALOWARE:1", "ALOWARE:2"),
        ("7", "2024-01-15 12:05:00", 1, "ALOWARE:4", "ALOWARE:4"),
    }

    # Batch 2 — agent 42 again at 16:00: closes its 14:00 session cross-batch
    # via the gap rule (state restored from the checkpoint).
    with open(landing / "b2.json", "w") as f:
        env = _envelope(5, created="2024-01-15T16:00:00")
        f.write(_json.dumps(env) + "\n")
    run_batch()

    got = {
        (r.AgentID, str(r.session_start), r.n_events, r.first_event, r.last_event)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {
        ("42", "2024-01-15 12:00:00", 2, "ALOWARE:1", "ALOWARE:2"),
        ("42", "2024-01-15 14:00:00", 1, "ALOWARE:3", "ALOWARE:3"),
        ("7", "2024-01-15 12:05:00", 1, "ALOWARE:4", "ALOWARE:4"),
    }


@pytest.mark.parametrize("bloom_pregate", [False, True, "auto"])
def test_ledger_gated_sink_dedups_across_checkpoint_loss(
    spark, tmp_path, bloom_pregate, monkeypatch, request
):
    """K4 streaming: the parquet-ledger gate holds the dedup horizon OUTSIDE
    the streaming checkpoint. A second stream instance with a brand-new
    checkpoint (simulating redeploy/checkpoint loss — exactly where
    dropDuplicatesWithinWatermark forgets its state) must still drop keys the
    first instance marked, and within-batch duplicates collapse keep-first
    before the gate. Parametrized over the Bloom pre-gate: the pre-gated
    micro-batch must produce the identical survivor set (no false
    negatives; maybes re-check exactly). The "auto" cell forces the regime
    rule's thresholds down so the dispatch itself is exercised end-to-end:
    instance 1 bootstraps from an in-memory empty ledger (no Catalyst
    estimate -> auto stays exact) and instance 2 reads the parquet ledger
    with broadcast disabled and a zero batch floor (-> auto pre-gates)."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.streaming import pipeline as _pl

    pregate_calls = []
    if bloom_pregate == "auto":
        monkeypatch.setattr(_pl, "PREGATE_AUTO_MIN_BATCH_ROWS", 0)
        key = "spark.sql.autoBroadcastJoinThreshold"
        old = spark.conf.get(key)
        spark.conf.set(key, "-1")
        request.addfinalizer(lambda: spark.conf.set(key, old))
        # Spy on the pre-gate so the cell can assert the dispatch really
        # flipped (the sink imports it at start time, so patching the
        # operators module is seen by write_batch).
        from quill_agent_dashboard_pbi_etl_spark.operators import dedup as _dd

        real_gate = _dd.ledger_gate_bloom

        def spy(*args, **kwargs):
            pregate_calls.append(1)
            return real_gate(*args, **kwargs)

        monkeypatch.setattr(_dd, "ledger_gate_bloom", spy)

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        envelopes_to_webhook_shape,
        start_ledger_gated_fact_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "fact"
    ledger = str(tmp_path / "ledger")

    import datetime as _dt

    # Freeze the TTL clock inside the events' 14-day window (the synthetic
    # events live in 2024-01; wall clock would see their TTL as expired).
    now_epoch = int(
        _dt.datetime(2024, 1, 20, tzinfo=_dt.timezone.utc).timestamp()
    )

    def run_instance(ckpt_name):
        stream = read_envelope_stream(spark, str(landing))
        fact = normalize_webhooks(envelopes_to_webhook_shape(stream))
        q = start_ledger_gated_fact_sink(
            fact,
            ledger,
            str(out),
            str(tmp_path / ckpt_name),
            available_now=True,
            now_epoch=now_epoch,
            bloom_pregate=bloom_pregate,
        )
        q.awaitTermination(180)

    # Instance 1: events 1, 2, and a within-batch duplicate of 1.
    with open(landing / "b1.json", "w") as f:
        for eid in (1, 2, 1):
            f.write(_json.dumps(_envelope(eid)) + "\n")
    run_instance("ckpt1")
    got = sorted(r.EventID for r in spark.read.parquet(str(out)).collect())
    assert got == ["ALOWARE:1", "ALOWARE:2"]

    # Instance 2: FRESH checkpoint (sees b1 again + new b2). The streaming
    # checkpoint forgot b1, but the ledger did not: only event 3 lands.
    with open(landing / "b2.json", "w") as f:
        f.write(_json.dumps(_envelope(3)) + "\n")
    run_instance("ckpt2")
    got = sorted(r.EventID for r in spark.read.parquet(str(out)).collect())
    assert got == ["ALOWARE:1", "ALOWARE:2", "ALOWARE:3"]

    if bloom_pregate == "auto":
        # Instance 1 bootstrapped from an in-memory empty ledger (no
        # Catalyst estimate -> exact path); instance 2 read the parquet
        # ledger with broadcast disabled and a zero floor -> the auto
        # dispatch must have pre-gated at least once.
        assert pregate_calls, "auto never dispatched to the Bloom pre-gate"


def test_should_bloom_pregate_regime_rule():
    """The auto pre-gate predicate encodes the surviving evidence: fire
    only past the session's broadcast threshold (the regime of the 8x
    shuffle cut and the sf300 de-confounded win) AND at huge deduped batch
    volumes; unknown estimate / unparseable conf never pre-gates."""
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        should_bloom_pregate,
    )

    mb = 1 << 20
    # batch_rows below are DEDUPED (post-keep_first) counts — the unit the
    # sink actually feeds the predicate (the grid's raw 30/60/100M axes map
    # to ~15/30/50M deduped at the generator's ~50% duplicate rate).
    # broadcastable ledger: never, regardless of batch size — the grid's
    # apparent 0.60x win at 58.8 MB (< the 64 MB session threshold) did
    # not survive a third run (flip_point_auto: exact min 82.8 s vs
    # pre-gate 93.8 s) and both grid decades broadcast at executed-plan
    # level (flip_point_mechanism).
    assert not should_bloom_pregate(5 * mb, 10 * mb, 10**9)
    assert not should_bloom_pregate(int(58.8 * mb), 64 * mb, 30_000_000)
    assert not should_bloom_pregate(int(19.9 * mb), 64 * mb, 50_000_000)
    # past broadcast but small batch: no
    assert not should_bloom_pregate(50 * mb, 10 * mb, 10_000_000)
    # past broadcast + huge deduped batch: yes (sf300-scale live ledgers
    # at the engine's 64 MB threshold, or a 20 MB ledger under a default
    # 10 MB threshold — the exact gate would shuffle the whole batch)
    assert should_bloom_pregate(50 * mb, 10 * mb, 30_000_000)
    assert should_bloom_pregate(177 * mb, 64 * mb, 30_000_000)
    assert should_bloom_pregate(20 * mb, 10 * mb, 30_000_000)
    # broadcast disabled (threshold <= 0) counts as not-broadcastable
    assert should_bloom_pregate(1, -1, 30_000_000)
    # unknown estimate or unparseable threshold conf -> exact path
    assert not should_bloom_pregate(None, 10 * mb, 10**9)
    assert not should_bloom_pregate(50 * mb, None, 10**9)
    # explicit floor override (what the e2e "auto" cell uses)
    assert should_bloom_pregate(1, -1, 1, min_batch_rows=0)
    # batch_rows=None = "assume a huge batch": only the live axes are
    # tested (the sink's could-it-fire pre-check before paying the
    # batch-sizing count job; monotone in batch_rows, so None ≡ +inf)
    assert should_bloom_pregate(50 * mb, 10 * mb, None)
    assert not should_bloom_pregate(5 * mb, 10 * mb, None)
    assert not should_bloom_pregate(None, 10 * mb, None)
    assert not should_bloom_pregate(50 * mb, None, None)


def test_parse_spark_bytes():
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        _parse_spark_bytes,
    )

    assert _parse_spark_bytes("10MB") == 10 << 20
    assert _parse_spark_bytes("10485760b") == 10 << 20
    assert _parse_spark_bytes("-1") == -1
    assert _parse_spark_bytes("1g") == 1 << 30
    assert _parse_spark_bytes("512k") == 512 << 10
    assert _parse_spark_bytes("garbage") is None


def test_ledger_gated_sink_backfill_older_than_ttl_still_dedups(spark, tmp_path):
    """TTL semantics regression: expiresAt is PROCESSING time + TTL (the
    reference's checkAndMark, ledger.repo.ts:12), not event time + TTL. A
    backfilled event whose EventTime predates the TTL window must still
    write a LIVE claim, so its duplicate arriving via a later instance is
    dropped — with event-time-derived expiry the claim would be born
    expired and the duplicate re-emitted."""
    import datetime as _dt
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        envelopes_to_webhook_shape,
        start_ledger_gated_fact_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "fact"
    ledger = str(tmp_path / "ledger")
    # Wall clock 2024-03-01; the event's created_at (2024-01-15) is ~46 days
    # old — far outside ttl_days=14 measured from EVENT time.
    now_epoch = int(
        _dt.datetime(2024, 3, 1, tzinfo=_dt.timezone.utc).timestamp()
    )

    def run_instance(ckpt_name):
        stream = read_envelope_stream(spark, str(landing))
        fact = normalize_webhooks(envelopes_to_webhook_shape(stream))
        q = start_ledger_gated_fact_sink(
            fact, ledger, str(out), str(tmp_path / ckpt_name),
            available_now=True, now_epoch=now_epoch,
        )
        q.awaitTermination(180)

    with open(landing / "b1.json", "w") as f:
        f.write(_json.dumps(_envelope(1)) + "\n")
    run_instance("ckpt1")
    # Fresh checkpoint replays the same old event: the claim must be live.
    run_instance("ckpt2")
    got = [r.EventID for r in spark.read.parquet(str(out)).collect()]
    assert got == ["ALOWARE:1"]


@pytest.mark.parametrize(
    "backend_name, bloom_pregate",
    [("posix", False), ("fake_remote", False), ("posix", True)],
)
def test_ledger_gated_sink_recovers_claimed_but_unwritten_events(
    spark, tmp_path, backend_name, bloom_pregate
):
    """Crash injection for the claim-then-verify protocol: a prior attempt of
    batch 0 CLAIMED event 1 in the ledger (tagged batch0) and died before
    writing any output. The retry must still emit event 1 — its key is live
    in the ledger, but the tag proves this batch owns it, so it is NOT
    dropped as a duplicate (the data-loss mode of a tagless mark-then-write
    sink).

    Parametrized over BOTH StateStorage backends: the same crash scenario
    must recover identically when control state (the generation marker)
    lives behind object-store primitives (FakeRemoteStorage — conditional
    put only, no link/rename) as on POSIX, proving the full sink run is
    storage-API-clean, not just marker-read/write-clean."""
    import datetime as _dt
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        envelopes_to_webhook_shape,
        start_ledger_gated_fact_sink,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming.state_store import (
        FakeRemoteStorage,
        LocalPosixStorage,
    )

    storage = LocalPosixStorage() if backend_name == "posix" else FakeRemoteStorage()
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "fact"
    ledger = str(tmp_path / "ledger")
    now_epoch = int(
        _dt.datetime(2024, 1, 20, tzinfo=_dt.timezone.utc).timestamp()
    )

    # The dead attempt's claim: event 1 live in the ledger, tagged with THIS
    # incarnation's batch-0 tag (fix the generation marker up front, exactly
    # as the crashed attempt would have created it — through the same
    # backend the sink will use).
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        _generation_id,
    )

    tag = f"{_generation_id(str(tmp_path / 'ckpt'), storage)}-b0"
    spark.createDataFrame(
        [("ALOWARE:1", _dt.datetime(2024, 1, 15, 3), now_epoch + 86400, tag)],
        "pk string, seenAt timestamp, expiresAt long, writer_id string",
    ).write.mode("append").parquet(ledger)

    with open(landing / "b1.json", "w") as f:
        for eid in (1, 2):
            f.write(_json.dumps(_envelope(eid)) + "\n")
    stream = read_envelope_stream(spark, str(landing))
    fact = normalize_webhooks(envelopes_to_webhook_shape(stream))
    q = start_ledger_gated_fact_sink(
        fact, ledger, str(out), str(tmp_path / "ckpt"),
        available_now=True, now_epoch=now_epoch, storage=storage,
        bloom_pregate=bloom_pregate,
    )
    q.awaitTermination(180)

    got = sorted(r.EventID for r in spark.read.parquet(str(out)).collect())
    assert got == ["ALOWARE:1", "ALOWARE:2"]
    # The retry's generation id must have come back through the backend —
    # same incarnation the dead attempt's claim was tagged with. The marker
    # must actually EXIST: startswith("") is vacuously true, so assert the
    # round-tripped value is non-empty before comparing (round-7 advice).
    gen = (
        storage.get_text(f"{tmp_path / 'ckpt'}/__spark_graft_generation") or ""
    ).strip()
    assert gen, "generation marker missing from the state backend"
    assert tag.startswith(gen)


def test_stateful_session_close_auto(spark, tmp_path):
    """Gap sessions through ``close_gap_sessions_auto`` — the deployment
    entry that probes the runtime and picks the state-v2 operator
    (``transformWithStateInPandas`` + RocksDB store) when ``google.protobuf``
    is available, else the ``applyInPandasWithState`` v1 operator. The
    emitted closed-session contract is identical either way; this test also
    asserts WHICH implementation the probe selected, so a silent fallback in
    a protobuf-equipped environment fails instead of masquerading as v2
    coverage. The real v2 wire path has its own protobuf-gated direct test
    below."""
    from quill_agent_dashboard_pbi_etl_spark.streaming import stateful

    v2 = stateful.state_v2_available()
    selected = stateful.selected_gap_session_impl()
    assert (selected is stateful.close_gap_sessions_v2) == v2
    assert (selected is stateful.close_gap_sessions) == (not v2)
    _run_gap_session_scenario(
        spark, tmp_path, stateful.close_gap_sessions_auto, use_rocksdb=v2
    )


def test_stateful_session_close_v2_direct(spark, tmp_path):
    """The state-v2 operator (``transformWithStateInPandas`` + RocksDB)
    called DIRECTLY — skipped (visibly, not silently) where the protobuf
    wire dependency is absent, so protobuf-equipped environments always
    exercise the real v2 path regardless of what the auto probe would do."""
    pytest.importorskip("google.protobuf")
    from quill_agent_dashboard_pbi_etl_spark.streaming.stateful import (
        close_gap_sessions_v2,
    )

    _run_gap_session_scenario(
        spark, tmp_path, close_gap_sessions_v2, use_rocksdb=True
    )


def _run_gap_session_scenario(spark, tmp_path, close_fn, use_rocksdb):
    """Shared two-batch gap-session scenario: within-batch gap close,
    watermark-timeout close, and a cross-batch close restored from the
    checkpoint. ``close_fn`` is any implementation of the closed-session
    contract."""
    import json as _json

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "sessions"
    ckpt = tmp_path / "ckpt"

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    if use_rocksdb:  # state v2 runs only on the RocksDB provider
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:

        def run_batch():
            from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
                normalize_webhooks,
            )
            from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
                envelopes_to_webhook_shape,
            )

            stream = read_envelope_stream(spark, str(landing))
            fact = normalize_webhooks(envelopes_to_webhook_shape(stream))
            sessions = close_fn(fact, gap_minutes=30)
            q = sessions.writeStream.foreachBatch(
                lambda df, _b: df.write.mode("append").parquet(str(out))
            ).outputMode("update").option(
                "checkpointLocation", str(ckpt)
            ).trigger(availableNow=True).start()
            q.awaitTermination(180)

        with open(landing / "b1.json", "w") as f:
            for eid, created, owner in (
                (1, "2024-01-15T12:00:00", 42),
                (2, "2024-01-15T12:10:00", 42),
                (3, "2024-01-15T14:00:00", 42),
                (4, "2024-01-15T12:05:00", 7),
            ):
                env = _envelope(eid, created=created)
                body = _json.loads(env["body"])
                body["body"]["owner_id"] = owner
                env["body"] = _json.dumps(body)
                f.write(_json.dumps(env) + "\n")
        run_batch()

        got = {
            (r.AgentID, str(r.session_start), r.n_events, r.first_event, r.last_event)
            for r in spark.read.parquet(str(out)).collect()
        }
        assert got == {
            ("42", "2024-01-15 12:00:00", 2, "ALOWARE:1", "ALOWARE:2"),
            ("7", "2024-01-15 12:05:00", 1, "ALOWARE:4", "ALOWARE:4"),
        }

        # Cross-batch: agent 42 at 16:00 closes its 14:00 session via the gap
        # rule, with state and timers restored from the checkpoint.
        with open(landing / "b2.json", "w") as f:
            f.write(_json.dumps(_envelope(5, created="2024-01-15T16:00:00")) + "\n")
        run_batch()

        got = {
            (r.AgentID, str(r.session_start), r.n_events, r.first_event, r.last_event)
            for r in spark.read.parquet(str(out)).collect()
        }
        assert got == {
            ("42", "2024-01-15 12:00:00", 2, "ALOWARE:1", "ALOWARE:2"),
            ("42", "2024-01-15 14:00:00", 1, "ALOWARE:3", "ALOWARE:3"),
            ("7", "2024-01-15 12:05:00", 1, "ALOWARE:4", "ALOWARE:4"),
        }
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)


def test_streaming_windowed_rollup(spark, tmp_path):
    """§2.7 windowed aggregation: tumbling 1-hour event-time windows with a
    watermark, append mode — closed windows emit exactly once."""
    import json as _json

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import normalize_webhooks
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        envelopes_to_webhook_shape,
        read_envelope_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "rollup"
    ckpt = tmp_path / "ckpt"

    with open(landing / "b1.json", "w") as f:
        for eid, created in (
            (1, "2024-01-15T09:10:00"),
            (2, "2024-01-15T09:40:00"),
            (3, "2024-01-15T10:20:00"),
            (4, "2024-01-15T13:00:00"),  # advances watermark past 09:00+1h+delay
        ):
            f.write(_json.dumps(_envelope(eid, created=created)) + "\n")

    fact = normalize_webhooks(
        envelopes_to_webhook_shape(read_envelope_stream(spark, str(landing)))
    )
    agg = (
        fact.withWatermark("EventTime", "10 minutes")
        .groupBy(F.window("EventTime", "1 hour").alias("w"), "AgentID")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "AgentID", "n")
    )
    q = (
        agg.writeStream.foreachBatch(
            lambda df, b: df.write.mode("append").parquet(str(out))
        )
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(str(r.window_start), r.n) for r in spark.read.parquet(str(out)).collect()}
    # 09:00 and 10:00 windows closed (watermark 12:50); 13:00 still open.
    assert got == {("2024-01-15 09:00:00", 2), ("2024-01-15 10:00:00", 1)}


def test_multimodal_resize_and_frame_sample(spark):
    from quill_agent_dashboard_pbi_etl_spark.functions.multimodal import (
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(0, "img " * 40), (1, "aud " * 80), (2, "vid " * 300), (3, "x")],
        "doc_id long, text string",
    )
    assets = synthesize_assets_from_documents(docs)  # 0=image 1=audio 2=video

    resized = {r.asset_id: r for r in resize_images(assets, 64, 64).collect()}
    assert len(resized) == 4  # non-images pass through
    assert resized[0].width == 64 and resized[0].byte_len == (64 * 64) // 64
    assert resized[1].width == 0  # audio untouched
    assert bytes(resized[1].content) == ("aud " * 80).encode()
    # deterministic: same source + target → same payload
    again = {r.asset_id: r for r in resize_images(assets, 64, 64).collect()}
    assert bytes(again[0].content) == bytes(resized[0].content)

    frames = sample_frames(assets, every_n=2, max_frames=3).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert 0 not in by_asset  # images produce no frames
    assert {r.frame_index for r in by_asset[2]} == {0, 2, 4}  # every 2nd, capped
    assert all(r.frame_bytes <= 64 for r in frames)


def test_streaming_corpus_gate(spark, tmp_path):
    """Quality gate + exact dedup over a document stream: short docs drop,
    duplicate content collapses to one row across micro-batches, survivors
    land in the sink."""
    import json

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        streaming_corpus_gate,
    )

    landing = tmp_path / "docs_in"
    landing.mkdir()
    out = tmp_path / "docs_out"
    ckpt = tmp_path / "ckpt_corpus"
    long_text = " ".join(["token"] * 25)
    rows = [
        {"doc_id": 1, "text": long_text, "lang": "en", "source": "s0",
         "event_time": "2024-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "too short", "lang": "en", "source": "s0",
         "event_time": "2024-01-01T00:01:00Z"},          # gated: < 20 tokens
        {"doc_id": 3, "text": long_text + " ", "lang": "en", "source": "s1",
         "event_time": "2024-01-01T00:02:00Z"},          # dup after normalize
        {"doc_id": 4, "text": " ".join(["word"] * 30), "lang": "de", "source": "s1",
         "event_time": "2024-01-01T00:03:00Z"},
    ]
    # two files → exercises cross-file dedup within one availableNow run
    (landing / "a.json").write_text("\n".join(json.dumps(r) for r in rows[:2]))
    (landing / "b.json").write_text("\n".join(json.dumps(r) for r in rows[2:]))

    q = (
        streaming_corpus_gate(spark, str(landing))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    ids = sorted(r.doc_id for r in got.collect())
    # doc 2 gated out; exactly one of {1, 3} survives dedup; 4 survives
    assert len(ids) == 2 and ids[1] == 4 and ids[0] in (1, 3)


def test_streaming_near_dup_gate(spark, tmp_path):
    """MinHash near-dup suppression across micro-batches AND across separate
    availableNow runs: the accepted-bucket index under state_dir persists
    outside the checkpoint, so a later run suppresses near-dups of documents
    accepted earlier. Within a batch, the lowest-id doc of a colliding
    bucket survives."""
    import json

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        start_streaming_near_dup_gate,
    )

    landing = tmp_path / "nd_in"
    landing.mkdir()
    out, state, ckpt = (
        str(tmp_path / "nd_out"), str(tmp_path / "nd_state"), str(tmp_path / "nd_ckpt"),
    )
    base = ["alpha bravo charlie delta echo foxtrot golf hotel india juliett",
            "kilo lima mike november oscar papa quebec romeo sierra tango"]
    text_a = " ".join(base * 2)                        # 40 tokens
    near_a = text_a.replace("hotel", "hostel", 1)      # near-dup of text_a
    near_a2 = text_a.replace("oscar", "oscars", 1)     # another near-dup
    text_b = " ".join(
        "zulu yankee xray whiskey victor uniform tree sun rain moon".split() * 4
    )

    def row(i, text):
        return {"doc_id": i, "text": text, "lang": "en", "source": "s",
                "event_time": f"2024-01-01T00:0{i}:00Z"}

    (landing / "a.json").write_text("\n".join(json.dumps(r) for r in [
        row(1, text_a),
        row(2, "too short"),          # quality-gated
        row(3, near_a),               # within-batch near-dup of 1
        row(4, text_b),
    ]))
    q = start_streaming_near_dup_gate(
        spark, str(landing), out, state, ckpt, available_now=True)
    q.awaitTermination(120)
    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 4]

    # Second run, same checkpoint: doc 5 is a near-dup of the ACCEPTED doc 1
    # (cross-run history suppression); doc 6 is fresh.
    (landing / "b.json").write_text("\n".join(json.dumps(r) for r in [
        row(5, near_a2),
        row(6, " ".join("one two three four five six seven eight nine ten".split() * 3)),
    ]))
    q = start_streaming_near_dup_gate(
        spark, str(landing), out, state, ckpt, available_now=True)
    q.awaitTermination(120)
    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 4, 6]


def test_streaming_quality_drift_monitor(spark, tmp_path):
    """Per-(source, window) keep-rates emit once per closed window: source B's
    degraded batch shows the keep-rate cliff while source A stays at 1.0."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        streaming_quality_drift,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    out = tmp_path / "drift"
    ckpt = tmp_path / "ckpt"

    # Passes the FULL shared quality gate (length, punctuation, stopword
    # band, token-length band — functions/text.quality_gates_prepped).
    good = "the data point " * 10
    bad = "short"
    rows = (
        [(i, good, "en", "A", f"2024-01-15T09:{10+i}:00") for i in range(4)]
        + [(10 + i, good if i < 1 else bad, "en", "B", f"2024-01-15T09:{10+i}:00")
           for i in range(4)]
        # late sentinel advances the watermark past 10:00 + delay → closes 9-10
        + [(99, good, "en", "A", "2024-01-15T13:00:00")]
    )
    with open(landing / "b1.json", "w") as f:
        for doc_id, text, lang, source, ts in rows:
            f.write(
                _json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": lang,
                     "source": source, "event_time": ts}
                )
                + "\n"
            )

    drift = streaming_quality_drift(spark, str(landing))
    q = (
        drift.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.source, str(r.window_start)): (r.n_docs, r.n_kept, r.keep_rate)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[("A", "2024-01-15 09:00:00")] == (4, 4, 1.0)
    assert got[("B", "2024-01-15 09:00:00")] == (4, 1, 0.25)
    # the 13:00 window stays open (no later watermark) → not emitted
    assert ("A", "2024-01-15 13:00:00") not in got


def test_batch_streaming_drift_parity(spark, tmp_path):
    """The batch drift monitor (quality_drift_by_source) and the streaming one
    (streaming_quality_drift) must report IDENTICAL per-source keep-rates on
    identical documents — the docstring contract that the monitored rate can
    never diverge from the enforced rate. Both derive keep from the shared
    functions.text.quality_gates_prepped dict; this test pins that sharing by
    landing the same real sf0.001 documents once as a parquet table (batch
    path) and once as JSON files (streaming path) and diffing the outputs."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.plans.extensions import (
        q_quality_drift_by_source,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        streaming_quality_drift,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text", "lang", "source").collect()

    # Batch side: the same rows as a documents table in a tmp sf_dir.
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    docs.write.parquet(str(sf_dir / "documents.parquet"))
    batch = {
        r.source: (r.n_docs, r.n_kept, r.keep_rate)
        for r in q_quality_drift_by_source(spark, str(sf_dir)).collect()
    }

    # Streaming side: identical rows as JSONL, all inside the 09:00 window,
    # plus a late watermark-advancing sentinel under a reserved source name.
    landing = tmp_path / "docs"
    landing.mkdir()
    out = tmp_path / "drift"
    ckpt = tmp_path / "ckpt"
    with open(landing / "b1.json", "w") as f:
        for r in rows:
            f.write(
                _json.dumps(
                    {"doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                     "source": r.source, "event_time": "2024-01-15T09:30:00"}
                )
                + "\n"
            )
        f.write(
            _json.dumps(
                {"doc_id": -1, "text": "sentinel", "lang": "en",
                 "source": "__sentinel__", "event_time": "2024-01-15T13:00:00"}
            )
            + "\n"
        )

    q = (
        streaming_quality_drift(spark, str(landing))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.source: (r.n_docs, r.n_kept, r.keep_rate)
        for r in spark.read.parquet(str(out)).collect()
        if r.source != "__sentinel__"
    }

    assert streamed == batch
    # and the fixture is non-degenerate: some source must actually drop docs
    assert any(kept < n for n, kept, _ in batch.values())


# --------------------------------------------------------------------------- #
# Orphaned-claims reclaim job (the ledger sink's one loss window, closed)
# --------------------------------------------------------------------------- #

def _build_orphan_scenario(
    spark, tmp_path, n_orphans=1, partition_by_expiry=False
):
    """Reproduce the documented loss window with a REAL mid-batch kill:

    1. instance 1 (ckpt1, generation g1) drains event 10 — batch 0 claims
       AND commits output (a dead-but-committed tag the reclaim must skip);
    2. event 1 arrives; the sink's output projection is patched to raise,
       so batch 1 CLAIMS ALOWARE:1 in the ledger and dies before writing
       any output — exactly the kill-between-claim-and-write crash point;
    3. the checkpoint is replaced (rm -rf ckpt1, fresh ckpt2 → g1 is dead);
    4. instance 2 replays the full source: both events are gated out by the
       live g1 claims — ALOWARE:1 is now in NO output. Returns the paths +
       the dead generation id.
    """
    import datetime as _dt
    import json as _json
    import shutil as _shutil

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming import pipeline as _pl

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "fact"
    ledger = str(tmp_path / "ledger")
    now_epoch = int(_dt.datetime(2024, 1, 20, tzinfo=_dt.timezone.utc).timestamp())

    def run_instance(ckpt_name, expect_fail=False):
        stream = _pl.read_envelope_stream(spark, str(landing))
        fact = normalize_webhooks(_pl.envelopes_to_webhook_shape(stream))
        q = _pl.start_ledger_gated_fact_sink(
            fact, ledger, str(out), str(tmp_path / ckpt_name),
            available_now=True, now_epoch=now_epoch,
            partition_by_expiry=partition_by_expiry,
        )
        if expect_fail:
            with pytest.raises(Exception):
                q.awaitTermination(180)
        else:
            q.awaitTermination(180)

    # 1. committed batch 0 of generation g1
    with open(landing / "a.json", "w") as f:
        f.write(_json.dumps(_envelope(10)) + "\n")
    run_instance("ckpt1")
    g1 = (
        (tmp_path / "ckpt1" / "__spark_graft_generation").read_text().strip()
    )

    # 2. batch 1 claims ALOWARE:1..n then dies before writing output
    with open(landing / "b.json", "w") as f:
        for i in range(1, n_orphans + 1):
            f.write(_json.dumps(_envelope(i)) + "\n")
    real_proj = _pl.to_physical_rows

    def _boom(df):
        raise RuntimeError("injected crash between claim and output write")

    _pl.to_physical_rows = _boom
    try:
        run_instance("ckpt1", expect_fail=True)
    finally:
        _pl.to_physical_rows = real_proj
    claimed = {
        r.pk: r.writer_id for r in spark.read.parquet(ledger).collect()
    }
    assert claimed["ALOWARE:1"] == f"{g1}-b1"  # claim durable, tag dead-to-be

    # 3. checkpoint replacement kills generation g1
    _shutil.rmtree(tmp_path / "ckpt1")

    # 4. the new incarnation replays everything; the dead claims gate both
    # events out — ALOWARE:1 is lost (the documented window)
    run_instance("ckpt2")
    emitted = sorted(r.EventID for r in spark.read.parquet(str(out)).collect())
    assert emitted == ["ALOWARE:10"]  # batch-0 output survives; event 1 lost

    batch_events = _pl.streaming_fact_pipeline(
        spark.read.schema(_pl.ENVELOPE_JSON_SCHEMA).json(str(landing))
    )
    return {
        "ledger": ledger,
        "out": str(out),
        "ckpt2": str(tmp_path / "ckpt2"),
        "g1": g1,
        "events": batch_events,
        "landing": landing,
        "now_epoch": now_epoch,
        "run_instance": run_instance,
    }


def test_reclaim_orphaned_claims_quarantine_exactly_once(spark, tmp_path):
    """VERDICT-prescribed scenario: kill between claim and output write,
    replace the checkpoint, reclaim in quarantine mode — the orphaned event
    lands in quarantine EXACTLY once (idempotent under rerun), the
    dead-but-committed tag is untouched, and the retagged claim still
    suppresses the key on future replays."""
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")

    reclaimed = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=s["events"], quarantine_dir=qdir,
    )
    rows = reclaimed.collect()
    assert [(r.pk, r.writer_id) for r in rows] == [
        ("ALOWARE:1", f"{s['g1']}-b1")
    ]
    quarantined = spark.read.parquet(qdir).collect()
    assert [(r.EventID, r.reclaim_tag) for r in quarantined] == [
        ("ALOWARE:1", f"{s['g1']}-b1")
    ]
    # ledger: orphan retagged (still protective), committed claim untouched
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"reclaimed:{s['g1']}-b1"
    assert led["ALOWARE:10"] == f"{s['g1']}-b0"
    # rerun is a no-op: same quarantine content, nothing newly reclaimed
    again = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=s["events"], quarantine_dir=qdir,
    )
    assert again.count() == 0
    assert spark.read.parquet(qdir).count() == 1
    # retagged claim still gates: a fresh replay emits nothing new
    s["run_instance"]("ckpt3")
    emitted = sorted(r.EventID for r in spark.read.parquet(s["out"]).collect())
    assert emitted == ["ALOWARE:10"]


def test_reclaim_orphaned_claims_release_readmits_once(spark, tmp_path):
    """Release mode: the orphaned claim rows are deleted, so the next replay
    re-admits the lost event exactly once; the committed claim keeps
    suppressing its key."""
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path)
    reclaimed = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]], mode="release"
    )
    assert [r.pk for r in reclaimed.collect()] == ["ALOWARE:1"]
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert "ALOWARE:1" not in led
    assert led["ALOWARE:10"] == f"{s['g1']}-b0"

    s["run_instance"]("ckpt3")
    emitted = sorted(r.EventID for r in spark.read.parquet(s["out"]).collect())
    assert emitted == ["ALOWARE:1", "ALOWARE:10"]
    # and only once: a further replay adds nothing (ckpt3's claim is live)
    s["run_instance"]("ckpt4")
    emitted = sorted(r.EventID for r in spark.read.parquet(s["out"]).collect())
    assert emitted == ["ALOWARE:1", "ALOWARE:10"]


def test_reclaim_quarantine_shortfall_raises_and_retags_nothing(spark, tmp_path):
    """An events source that does NOT re-supply an orphaned EventID must not
    let quarantine mode retag that claim (retag + zero quarantine rows =
    permanently invisible loss). Default: raise, ledger untouched, so a
    later run with a fuller source can still reclaim."""
    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    truncated = s["events"].filter(F.col("EventID") != "ALOWARE:1")

    with pytest.raises(ValueError, match="quarantine shortfall"):
        reclaim_orphaned_claims(
            spark, s["ledger"], s["out"], [s["ckpt2"]],
            mode="quarantine", events=truncated, quarantine_dir=qdir,
        )
    # nothing retagged, nothing quarantined — the claim is still an orphan
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"{s['g1']}-b1"
    import os
    assert not os.path.exists(qdir) or not [
        f for f in os.listdir(qdir) if f.startswith("reclaim_tag=")
    ]
    # a later run with the FULL source reclaims normally
    reclaimed = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=s["events"], quarantine_dir=qdir,
    )
    assert [r.pk for r in reclaimed.collect()] == ["ALOWARE:1"]
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"reclaimed:{s['g1']}-b1"


def test_reclaim_quarantine_allow_partial_leaves_uncovered_claims(spark, tmp_path):
    """allow_partial=True with a truncated source: the uncovered claim keeps
    its dead tag (still a reclaim candidate) and the return carries only the
    covered rows — here, none."""
    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    truncated = s["events"].filter(F.col("EventID") != "ALOWARE:1")

    reclaimed = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=truncated, quarantine_dir=qdir,
        allow_partial=True,
    )
    assert reclaimed.count() == 0
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"{s['g1']}-b1"  # NOT retagged — reclaimable
    # the fuller source then covers it
    reclaimed = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=s["events"], quarantine_dir=qdir,
        allow_partial=True,
    )
    assert [r.pk for r in reclaimed.collect()] == ["ALOWARE:1"]
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"reclaimed:{s['g1']}-b1"
    quarantined = spark.read.parquet(qdir).collect()
    assert [(r.EventID, r.reclaim_tag) for r in quarantined] == [
        ("ALOWARE:1", f"{s['g1']}-b1")
    ]


def test_reclaim_quarantine_shortfall_preserves_partial_output(spark, tmp_path):
    """ADVICE r12: in quarantine mode the partial-output GC is deferred
    until the coverage gate passes — on a shortfall raise the orphans'
    uncommitted output files are the LAST on-disk trace of the uncovered
    events, so the raise must leave them intact (along with ledger and
    quarantine dir). A later full-source run then reclaims normally and
    GCs the partials."""
    import os

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    # fabricate the partial (no _SUCCESS) output the dead batch left behind
    partial = os.path.join(s["out"], f"gen={s['g1']}", "batch_id=1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")
    truncated = s["events"].filter(F.col("EventID") != "ALOWARE:1")

    with pytest.raises(ValueError, match="quarantine shortfall"):
        reclaim_orphaned_claims(
            spark, s["ledger"], s["out"], [s["ckpt2"]],
            mode="quarantine", events=truncated, quarantine_dir=qdir,
        )
    # the raise deleted NOTHING: partials intact, claim untouched
    assert os.path.exists(os.path.join(partial, "part-00000.parquet"))
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"{s['g1']}-b1"

    # full source: gate passes → partials GC'd, claim retagged
    reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=s["events"], quarantine_dir=qdir,
    )
    assert not os.path.exists(partial)
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"reclaimed:{s['g1']}-b1"


def test_reclaim_quarantine_allow_partial_rerun_merges(spark, tmp_path):
    """ADVICE r12 (medium): a tag covered INCREMENTALLY across allow_partial
    runs must accumulate quarantine records, not clobber them. Run 1's
    source covers only ALOWARE:1 (retagged + quarantined); run 2's source
    covers only ALOWARE:2 — the tag is re-identified (2 kept its dead tag)
    and the partition overwrite must carry run 1's row forward."""
    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path, n_orphans=2)
    qdir = str(tmp_path / "quarantine")
    tag = f"{s['g1']}-b1"

    only1 = s["events"].filter(F.col("EventID") == "ALOWARE:1")
    got = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=only1, quarantine_dir=qdir,
        allow_partial=True,
    )
    assert [r.pk for r in got.collect()] == ["ALOWARE:1"]
    assert [
        (r.EventID, r.reclaim_tag)
        for r in spark.read.parquet(qdir).collect()
    ] == [("ALOWARE:1", tag)]

    # run 2: a DIFFERENT slice of the source — covers only the remaining
    # orphan; run 1's triage record must survive the partition overwrite
    only2 = s["events"].filter(F.col("EventID") == "ALOWARE:2")
    got = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=only2, quarantine_dir=qdir,
        allow_partial=True,
    )
    assert [r.pk for r in got.collect()] == ["ALOWARE:2"]
    quarantined = sorted(
        (r.EventID, r.reclaim_tag) for r in spark.read.parquet(qdir).collect()
    )
    assert quarantined == [("ALOWARE:1", tag), ("ALOWARE:2", tag)]
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"reclaimed:{tag}"
    assert led["ALOWARE:2"] == f"reclaimed:{tag}"


def test_reclaim_allow_partial_keeps_uncovered_tags_partial_output(
    spark, tmp_path
):
    """A tag that still has UNCOVERED claims after an allow_partial run
    must keep its partial output — it is the last on-disk trace of the
    uncovered events, which the shortfall contract advertises as
    reclaimable by a later fuller-source run. Only a fully-covered tag's
    partials are GC'd."""
    import os

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path, n_orphans=2)
    qdir = str(tmp_path / "quarantine")
    partial = os.path.join(s["out"], f"gen={s['g1']}", "batch_id=1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")

    # run 1 covers only ALOWARE:1 — the tag still has an uncovered claim
    only1 = s["events"].filter(F.col("EventID") == "ALOWARE:1")
    got = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=only1, quarantine_dir=qdir,
        allow_partial=True,
    )
    assert [r.pk for r in got.collect()] == ["ALOWARE:1"]
    assert os.path.exists(
        os.path.join(partial, "part-00000.parquet")
    ), "partial output of a not-fully-covered tag was GC'd"

    # run 2 covers the remainder — now the tag is fully covered and GC'd
    only2 = s["events"].filter(F.col("EventID") == "ALOWARE:2")
    got = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=only2, quarantine_dir=qdir,
        allow_partial=True,
    )
    assert [r.pk for r in got.collect()] == ["ALOWARE:2"]
    assert not os.path.exists(partial)


def test_partitioned_streaming_ledger_gate_parity_and_layout(spark, tmp_path):
    """Directive r12-3: the streaming claim sink on an expiry-PARTITIONED
    ledger — same emitted output as the flat run (gate parity), the ledger
    keeps its expiryDay= layout across claim appends, duplicates stay
    gated across restarts, and the per-batch gate scan partition-prunes."""
    import json as _json
    import os

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming import pipeline as _pl

    import datetime as _dt

    landing = tmp_path / "landing"
    landing.mkdir()
    now_epoch = int(_dt.datetime(2024, 1, 20, tzinfo=_dt.timezone.utc).timestamp())
    with open(landing / "a.json", "w") as f:
        f.write(_json.dumps(_envelope(1)) + "\n")
        f.write(_json.dumps(_envelope(2)) + "\n")

    outs = {}
    for layout, flag in (("flat", False), ("part", True)):
        out = str(tmp_path / f"fact_{layout}")
        ledger = str(tmp_path / f"ledger_{layout}")

        def run(ckpt):
            stream = _pl.read_envelope_stream(spark, str(landing))
            fact = normalize_webhooks(_pl.envelopes_to_webhook_shape(stream))
            q = _pl.start_ledger_gated_fact_sink(
                fact, ledger, out, str(tmp_path / f"{ckpt}_{layout}"),
                available_now=True, now_epoch=now_epoch,
                partition_by_expiry=flag,
            )
            q.awaitTermination(180)

        run("ckpt1")
        # duplicate replay from a fresh checkpoint: the external ledger
        # (not stream state) must gate both events out
        run("ckpt2")
        outs[layout] = sorted(
            r.EventID for r in spark.read.parquet(out).collect()
        )
        part_dirs = [
            d for d in os.listdir(ledger) if d.startswith("expiryDay=")
        ]
        if flag:
            assert part_dirs, "partitioned sink lost its layout"
            # claims expire ttl_days after now_epoch — UTC day 2024-02-03
            assert part_dirs == ["expiryDay=2024-02-03"]
        else:
            assert not part_dirs

    assert outs["flat"] == outs["part"] == ["ALOWARE:1", "ALOWARE:2"]


def test_sink_partition_flag_is_three_valued(spark, tmp_path):
    """ADVICE r13 (API asymmetry): the sink forwards append_ledger's
    bool|None contract — explicit False now ENFORCES flat (fails loudly
    against a partitioned ledger instead of silently following it), and
    the default None follows the existing layout."""
    import datetime as _dt
    import json as _json
    import os

    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark import sinks
    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming import pipeline as _pl

    landing = tmp_path / "landing"
    landing.mkdir()
    now_epoch = int(_dt.datetime(2024, 1, 20, tzinfo=_dt.timezone.utc).timestamp())
    with open(landing / "a.json", "w") as f:
        f.write(_json.dumps(_envelope(1)) + "\n")
    ledger = str(tmp_path / "ledger")
    seed = spark.createDataFrame(
        [("seed-x", _dt.datetime(2024, 1, 19), now_epoch + 14 * 86400)],
        "pk string, seenAt timestamp, expiresAt long",
    ).withColumn("writer_id", F.lit("seed"))
    sinks.append_ledger(seed, ledger, partition_by_expiry=True)

    def run(flag, ckpt, expect_fail):
        stream = _pl.read_envelope_stream(spark, str(landing))
        fact = normalize_webhooks(_pl.envelopes_to_webhook_shape(stream))
        q = _pl.start_ledger_gated_fact_sink(
            fact, ledger, str(tmp_path / "fact"), str(tmp_path / ckpt),
            available_now=True, now_epoch=now_epoch,
            partition_by_expiry=flag,
        )
        if expect_fail:
            with pytest.raises(Exception, match="already holds a"):
                q.awaitTermination(180)
        else:
            q.awaitTermination(180)

    # explicit False against the partitioned ledger: loud failure, no write
    run(False, "ckpt_false", expect_fail=True)
    # default None: follows the partitioned layout
    run(None, "ckpt_none", expect_fail=False)
    assert any(d.startswith("expiryDay=") for d in os.listdir(ledger))
    led = spark.read.parquet(ledger)
    assert {r.pk for r in led.collect()} == {"seed-x", "ALOWARE:1"}


def test_partitioned_replay_across_utc_midnight_recovers_claims(spark, tmp_path):
    """ADVICE r13 (high): a batch that appended its claims and crashed
    before writing output must recover its survivors on replay EVEN WHEN
    the retry crosses a UTC midnight. The verify read-back on a
    partitioned ledger prunes expiryDay partitions; an equality prune on
    day(now + ttl) recomputes `now` at retry time, lands one day past the
    day the first attempt's claims landed in, reads back zero claims, and
    commits an EMPTY output with _SUCCESS while the claims stand — the
    events would be suppressed forever and reclaim would skip the tag
    (its output looks committed). The range prune keeps every claim the
    tag still owns."""
    import datetime as _dt
    import json as _json
    import os

    from quill_agent_dashboard_pbi_etl_spark.functions.adapter import (
        normalize_webhooks,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming import pipeline as _pl

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "fact")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    # attempt 1 runs 30 s before a UTC midnight; the retry 30 s after it —
    # day(now + ttl) differs between the attempts (2024-02-03 vs 2024-02-04)
    now1 = int(
        _dt.datetime(2024, 1, 20, 23, 59, 30, tzinfo=_dt.timezone.utc).timestamp()
    )
    now2 = now1 + 60

    with open(landing / "a.json", "w") as f:
        f.write(_json.dumps(_envelope(1)) + "\n")

    def run(now_epoch, expect_fail=False):
        stream = _pl.read_envelope_stream(spark, str(landing))
        fact = normalize_webhooks(_pl.envelopes_to_webhook_shape(stream))
        q = _pl.start_ledger_gated_fact_sink(
            fact, ledger, out, ckpt,
            available_now=True, now_epoch=now_epoch,
            partition_by_expiry=True,
        )
        if expect_fail:
            with pytest.raises(Exception):
                q.awaitTermination(180)
        else:
            q.awaitTermination(180)

    # attempt 1: claims land in expiryDay=2024-02-03, then the batch dies
    # between the claim append and the output write
    real_proj = _pl.to_physical_rows

    def _boom(df):
        raise RuntimeError("injected crash between claim and output write")

    _pl.to_physical_rows = _boom
    try:
        run(now1, expect_fail=True)
    finally:
        _pl.to_physical_rows = real_proj
    assert os.listdir(ledger), "attempt 1 must have appended its claims"
    assert any(
        d.startswith("expiryDay=2024-02-03") for d in os.listdir(ledger)
    )

    # retry: SAME checkpoint (same generation, same batch id → same tag),
    # but `now` has crossed the midnight. The gate sees the live claims
    # (nothing new to claim); the verify read-back must still find the
    # tag's day-2024-02-03 claims and emit the event.
    run(now2)
    emitted = sorted(r.EventID for r in spark.read.parquet(out).collect())
    assert emitted == ["ALOWARE:1"], (
        "midnight-crossing replay lost the first attempt's claims — "
        "the events are permanently suppressed"
    )


def test_reclaim_on_partitioned_streaming_ledger(spark, tmp_path):
    """The reclaim job on a partitioned streaming ledger: quarantine mode
    retags through the layout-preserving rewrite (expiryDay= dirs survive),
    the retagged claim still gates, and an injected crash at the rewrite is
    recoverable with the layout intact."""
    import os

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path, partition_by_expiry=True)
    qdir = str(tmp_path / "quarantine")
    assert any(
        d.startswith("expiryDay=") for d in os.listdir(s["ledger"])
    ), "scenario ledger is not partitioned"

    # crash INSIDE the rewrite (after scratch write, before the swap):
    # recovery must restore a readable, still-partitioned ledger
    real_rename = os.rename

    def _boom(src, dst):
        if src.endswith(".reclaim-new"):
            raise RuntimeError("injected crash mid-swap")
        return real_rename(src, dst)

    os.rename = _boom
    try:
        with pytest.raises(Exception, match="injected crash"):
            reclaim_orphaned_claims(
                spark, s["ledger"], s["out"], [s["ckpt2"]],
                mode="quarantine", events=s["events"], quarantine_dir=qdir,
            )
    finally:
        os.rename = real_rename

    # The crash hit the SECOND rename: scratch was fully written and the
    # quarantine row committed, so recovery (finish_interrupted_ledger_swap
    # at the rerun's entry) COMPLETES the swap — the retag is durable and
    # the rerun correctly finds nothing left to reclaim. Crash-safe means
    # exactly-once, not re-run-visible.
    got = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]],
        mode="quarantine", events=s["events"], quarantine_dir=qdir,
    )
    assert got.count() == 0
    assert [
        (r.EventID, r.reclaim_tag) for r in spark.read.parquet(qdir).collect()
    ] == [("ALOWARE:1", f"{s['g1']}-b1")]
    assert any(d.startswith("expiryDay=") for d in os.listdir(s["ledger"]))
    assert not os.path.exists(s["ledger"] + ".reclaim-new")
    assert not os.path.exists(s["ledger"] + ".reclaim-old")
    led = {
        r.pk: r.writer_id
        for r in spark.read.parquet(s["ledger"]).drop("expiryDay").collect()
    }
    assert led["ALOWARE:1"] == f"reclaimed:{s['g1']}-b1"
    # the retagged claim still gates: a fresh replay emits nothing new
    s["run_instance"]("ckpt3")
    emitted = sorted(r.EventID for r in spark.read.parquet(s["out"]).collect())
    assert emitted == ["ALOWARE:10"]


def test_reclaim_gc_runs_before_ledger_rewrite(spark, tmp_path):
    """ADVICE r11: partial (uncommitted) output must be GC'd BEFORE the
    ledger rewrite — a crash between the rewrite and a later GC would drop
    the tags that make the garbage re-derivable, leaking it permanently.
    Staged here as the rewrite raising: the partial dir must already be
    gone, the claim untouched, and a clean re-run must still reclaim."""
    import os

    import quill_agent_dashboard_pbi_etl_spark.operators.dedup as _dedup
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        reclaim_orphaned_claims,
    )

    s = _build_orphan_scenario(spark, tmp_path)
    # fabricate the partial (no _SUCCESS) output the dead batch left behind
    partial = os.path.join(s["out"], f"gen={s['g1']}", "batch_id=1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")

    real_rewrite = _dedup.rewrite_ledger_atomic

    def _boom(*a, **k):
        raise RuntimeError("injected crash at the ledger rewrite")

    _dedup.rewrite_ledger_atomic = _boom
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            reclaim_orphaned_claims(
                spark, s["ledger"], s["out"], [s["ckpt2"]], mode="release"
            )
    finally:
        _dedup.rewrite_ledger_atomic = real_rewrite
    assert not os.path.exists(partial)  # GC happened before the rewrite
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"{s['g1']}-b1"  # claim survived the crash
    # the orphan set was re-derivable: the rerun reclaims normally
    reclaimed = reclaim_orphaned_claims(
        spark, s["ledger"], s["out"], [s["ckpt2"]], mode="release"
    )
    assert [r.pk for r in reclaimed.collect()] == ["ALOWARE:1"]


def test_reclaim_ledger_cli_smoke(spark, tmp_path):
    """tools/reclaim_ledger.py: one command = reclaim (quarantine) +
    compaction, RUNBOOK defaults; prints/returns the JSON summary."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import reclaim_ledger as _cli

    s = _build_orphan_scenario(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    summary = _cli.main(
        [
            "--ledger", s["ledger"],
            "--output-dir", s["out"],
            "--live-ckpt", s["ckpt2"],
            "--mode", "quarantine",
            "--events-landing", str(s["landing"]),
            "--quarantine-dir", qdir,
            "--compact",
            "--now-epoch", str(s["now_epoch"]),
        ],
        spark=spark,
    )
    assert summary["reclaimed"] == 1
    assert summary["reclaimed_pks_sample"] == ["ALOWARE:1"]
    assert summary["compacted"] == 0  # nothing expired at the scenario clock
    led = {r.pk: r.writer_id for r in spark.read.parquet(s["ledger"]).collect()}
    assert led["ALOWARE:1"] == f"reclaimed:{s['g1']}-b1"
    assert spark.read.parquet(qdir).count() == 1


def test_finish_interrupted_ledger_swap_states(tmp_path):
    """Every crash point of the rename swap resolves without losing a row:
    (a) between the two renames → finish with NEW; (b) before any rename →
    stale NEW dropped; (c) after the swap, GC missed → OLD dropped; (d)
    OLD only (NEW lost) → roll back to OLD."""
    import os

    from quill_agent_dashboard_pbi_etl_spark.operators.dedup import (
        finish_interrupted_ledger_swap as _finish_interrupted_ledger_swap,
    )

    def mk(path, payload):
        os.makedirs(path)
        with open(os.path.join(path, "part-0"), "w") as f:
            f.write(payload)

    def payload(path):
        with open(os.path.join(path, "part-0")) as f:
            return f.read()

    # (a) crashed between renames: OLD + NEW, no live dir
    led = str(tmp_path / "a" / "ledger")
    os.makedirs(tmp_path / "a")
    mk(led + ".reclaim-old", "old")
    mk(led + ".reclaim-new", "new")
    _finish_interrupted_ledger_swap(led)
    assert payload(led) == "new"
    assert not os.path.exists(led + ".reclaim-old")
    assert not os.path.exists(led + ".reclaim-new")

    # (b) crashed before any rename: live + stale NEW
    led = str(tmp_path / "b" / "ledger")
    mk(led, "live")
    mk(led + ".reclaim-new", "new")
    _finish_interrupted_ledger_swap(led)
    assert payload(led) == "live"
    assert not os.path.exists(led + ".reclaim-new")

    # (c) crashed after swap, before GC: live + OLD
    led = str(tmp_path / "c" / "ledger")
    mk(led, "new")
    mk(led + ".reclaim-old", "old")
    _finish_interrupted_ledger_swap(led)
    assert payload(led) == "new"
    assert not os.path.exists(led + ".reclaim-old")

    # (d) OLD only: roll back
    led = str(tmp_path / "d" / "ledger")
    os.makedirs(tmp_path / "d")
    mk(led + ".reclaim-old", "old")
    _finish_interrupted_ledger_swap(led)
    assert payload(led) == "old"
    assert not os.path.exists(led + ".reclaim-old")
