"""Count-min sketch contracts (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import sketches


def _stream(spark):
    # skewed stream: key k appears k times (1..50) → 1275 rows
    rows = [(f"k{k}",) for k in range(1, 51) for _ in range(k)]
    return spark.createDataFrame(rows, "key string")


def test_cms_never_underestimates_and_bounded(spark):
    df = _stream(spark)
    counters = sketches.cms_counters(df, "key")
    est = {
        r.key: r.cms_est
        for r in sketches.cms_estimate(df, counters, "key").collect()
    }
    true = {f"k{k}": k for k in range(1, 51)}
    n = sum(true.values())
    slack = int(2.72 / 8192 * n) + 1
    for k, t in true.items():
        assert est[k] >= t, f"CMS underestimated {k}: {est[k]} < {t}"
        assert est[k] <= t + slack, f"CMS overflow {k}: {est[k]} > {t}+{slack}"


def test_cms_counter_table_is_bounded_and_mergeable(spark):
    """The sketch's size is depth×width regardless of cardinality, and the
    counter table of a union equals the summed counter tables — the property
    that makes it a pre-aggregable, cross-batch-mergeable structure."""
    a = _stream(spark)
    b = spark.createDataFrame([(f"z{k}",) for k in range(200)], "key string")
    ca = sketches.cms_counters(a, "key", depth=2, width=64)
    cb = sketches.cms_counters(b, "key", depth=2, width=64)
    assert ca.count() <= 2 * 64

    merged_tables = (
        ca.unionByName(cb)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    from_union = sketches.cms_counters(a.unionByName(b), "key", depth=2, width=64)
    lhs = {(r.seed, r.bucket): r.cnt for r in merged_tables.collect()}
    rhs = {(r.seed, r.bucket): r.cnt for r in from_union.collect()}
    assert lhs == rhs


def test_streaming_cms_counter_sink_merges_batches(spark, tmp_path):
    """The persisted streaming sketch after two micro-batches must equal the
    batch sketch over the union of both batches' keys — cross-batch
    mergeability through the parquet counter table — and point estimates
    from the persisted table must never underestimate."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        start_cms_counter_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    counters_path = str(tmp_path / "counters")

    def run_batch(name, keys):
        with open(landing / f"{name}.json", "w") as f:
            for k in keys:
                f.write(_json.dumps({"key": k}) + "\n")
        stream = spark.readStream.schema("key string").json(str(landing))
        q = start_cms_counter_sink(
            stream,
            counters_path,
            str(tmp_path / f"ckpt_{name}"),
            "key",
            depth=2,
            width=64,
            available_now=True,
        )
        q.awaitTermination(180)

    b1 = [f"a{i % 3}" for i in range(30)]   # a0 x10, a1 x10, a2 x10
    b2 = [f"a{i % 2}" for i in range(10)]   # a0 x5, a1 x5
    run_batch("b1", b1)
    # fresh checkpoint → b2 run replays b1's file too: counters see b1 twice
    # plus b2 once. Use a shared checkpoint instead to get exactly-once.
    stream = spark.readStream.schema("key string").json(str(landing))
    with open(landing / "b2.json", "w") as f:
        for k in b2:
            f.write(_json.dumps({"key": k}) + "\n")
    q = start_cms_counter_sink(
        stream,
        counters_path,
        str(tmp_path / "ckpt_b1"),  # SAME checkpoint → only b2 is new
        "key",
        depth=2,
        width=64,
        available_now=True,
    )
    q.awaitTermination(180)

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        read_cms_counters,
    )

    persisted = read_cms_counters(spark, counters_path)
    all_keys = spark.createDataFrame([(k,) for k in b1 + b2], "key string")
    expected = sketches.cms_counters(all_keys, "key", depth=2, width=64)
    lhs = {(r.seed, r.bucket): r.cnt for r in persisted.collect()}
    rhs = {(r.seed, r.bucket): r.cnt for r in expected.collect()}
    assert lhs == rhs

    est = {
        r.key: r.cms_est
        for r in sketches.cms_estimate(
            all_keys, persisted, "key", depth=2, width=64
        ).collect()
    }
    true = {"a0": 15, "a1": 15, "a2": 10}
    for k, t in true.items():
        assert est[k] >= t


def test_streaming_hll_distinct_sink_idempotent_union(spark, tmp_path):
    """Two micro-batches with overlapping values: the persisted per-group HLL
    sketches estimate the distinct count of the UNION exactly (HLL is exact
    at these cardinalities), and re-inserting seen values on replay changes
    nothing — insertion idempotence, the property that makes distinct
    counting exactly-once under at-least-once delivery."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        hll_estimates,
        start_hll_distinct_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    sketch_path = str(tmp_path / "sketches")

    def run(ckpt, rows):
        with open(landing / f"{ckpt}.json", "w") as f:
            for g, v in rows:
                f.write(_json.dumps({"g": g, "v": v}) + "\n")
        stream = spark.readStream.schema("g string, v string").json(str(landing))
        q = start_hll_distinct_sink(
            stream, sketch_path, str(tmp_path / ckpt), "g", "v",
            available_now=True,
        )
        q.awaitTermination(180)

    run("ck1", [("CALLS", f"a{i}") for i in range(20)] + [("TEXTS", "a0")])
    # FRESH checkpoint: replays batch 1 (idempotent re-insert) + adds batch 2
    # with 10 seen + 10 new agents for CALLS. The generation-bound batch tag
    # must NOT mistake this rebuilt batch 0 for a retry of ck1's batch 0.
    run("ck2", [("CALLS", f"a{i}") for i in range(10, 30)])

    est = {
        r.g: r.distinct_estimate
        for r in hll_estimates(spark, sketch_path, "g").collect()
    }
    assert est == {"CALLS": 30, "TEXTS": 1}


def test_versioned_state_survives_partial_write(spark, tmp_path):
    """Crash-window contract for the sketch sinks' versioned state: a
    half-written newer snapshot (no completeness marker — the crash landed
    between parquet write and marker stamp) is invisible to readers, and the
    previous committed snapshot is still served intact."""
    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        _commit_state_version,
        _read_latest_state,
    )

    root = str(tmp_path / "state")
    schema = "seed int, bucket bigint, cnt bigint"
    good = spark.createDataFrame([(0, 1, 5), (1, 2, 7)], schema)
    _commit_state_version(good, root, 1, "gen-b0")

    # Simulated crash: v=2 parquet written, marker never stamped.
    bad = spark.createDataFrame([(0, 1, 999)], schema)
    bad.write.mode("overwrite").parquet(f"{root}/v=2")

    df, ver, tag = _read_latest_state(spark, root, schema)
    assert (ver, tag) == (1, "gen-b0")
    assert {(r.seed, r.bucket, r.cnt) for r in df.collect()} == {(0, 1, 5), (1, 2, 7)}


def test_cms_sink_runs_on_object_store_primitives(spark, tmp_path):
    """The sink protocols must need nothing stronger than the four
    object-store control primitives (conditional put / get / list / delete
    — no rename, link, or directory atomicity): the CMS sink run end-to-end
    against the FakeRemoteStorage backend must persist the same counter
    table as a batch sketch over the same keys."""
    import json as _json

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        read_cms_counters,
        start_cms_counter_sink,
    )
    from quill_agent_dashboard_pbi_etl_spark.streaming.state_store import (
        FakeRemoteStorage,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    counters_path = str(tmp_path / "counters")
    remote = FakeRemoteStorage()
    keys = [f"a{i % 3}" for i in range(30)]
    with open(landing / "b1.json", "w") as f:
        for k in keys:
            f.write(_json.dumps({"key": k}) + "\n")
    stream = spark.readStream.schema("key string").json(str(landing))
    q = start_cms_counter_sink(
        stream, counters_path, str(tmp_path / "ckpt"), "key",
        depth=2, width=64, available_now=True, storage=remote,
    )
    q.awaitTermination(180)

    persisted = read_cms_counters(spark, counters_path, storage=remote)
    expected = sketches.cms_counters(
        spark.createDataFrame([(k,) for k in keys], "key string"),
        "key", depth=2, width=64,
    )
    lhs = {(r.seed, r.bucket): r.cnt for r in persisted.collect()}
    rhs = {(r.seed, r.bucket): r.cnt for r in expected.collect()}
    assert lhs == rhs
    # And the generation marker went through the backend, not bare os calls:
    marker = f"{tmp_path / 'ckpt'}/__spark_graft_generation"
    assert (remote.get_text(marker) or "").strip()


def test_state_storage_contracts(tmp_path):
    """StateStorage backends: put_if_absent is first-writer-wins and the
    object is never observable empty; URI paths demand an explicit
    backend."""
    import pytest

    from quill_agent_dashboard_pbi_etl_spark.streaming.state_store import (
        FakeRemoteStorage,
        LocalPosixStorage,
        storage_for,
    )

    for backend in (LocalPosixStorage(), FakeRemoteStorage()):
        p = str(tmp_path / f"m_{type(backend).__name__}")
        backend.ensure_dir(str(tmp_path))
        assert backend.get_text(p) is None
        assert backend.put_if_absent(p, "first") is True
        assert backend.put_if_absent(p, "second") is False  # loser yields
        assert backend.get_text(p) == "first"
        assert backend.list_dir(str(tmp_path / "nope")) == []

    assert isinstance(storage_for(str(tmp_path)), LocalPosixStorage)
    with pytest.raises(ValueError, match="StateStorage backend"):
        storage_for("s3://bucket/ckpt")


def test_generation_id_survives_restart_but_not_rebuild(tmp_path):
    """The incarnation id backing the sinks' retry detection: stable across
    restarts that keep the checkpoint, fresh after an in-place checkpoint
    rebuild (rm -rf at the SAME path) — so a rebuilt stream's batch 0 can
    never be mistaken for a retry of the old incarnation's batch 0."""
    import shutil

    from quill_agent_dashboard_pbi_etl_spark.streaming.pipeline import (
        _generation_id,
    )

    ckpt = str(tmp_path / "ckpt")
    g1 = _generation_id(ckpt)
    assert _generation_id(ckpt) == g1  # restart with checkpoint intact
    shutil.rmtree(ckpt)
    g2 = _generation_id(ckpt)  # in-place rebuild
    assert g2 != g1
