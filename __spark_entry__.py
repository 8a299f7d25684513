"""Driver contract for the PySpark engine.

``entry(spark)`` runs the flagship ingest-to-dashboard pipeline on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
north-star extension ops); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each (queries without an oracle are approximate/engine-native ops checked
rows-only).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401 — registers extension queries
from quill_agent_dashboard_pbi_etl_spark.plans import registry


def _ensure_conf(spark: SparkSession) -> None:
    """Engine-required session settings, applied defensively because the
    driver owns the SparkSession: UTC render timezone (oracle parity) and
    nanos-as-long parquet reads (driver testdata uses TIMESTAMP(NANOS), which
    Spark 4 otherwise refuses)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full reference pipeline end-to-end at sf0.001 — webhook
    normalization (P1-P12) → keep-first dedup (D1) → daily rollup (A3) →
    goal attainment (A4). Scan → project → filter → dedup → aggregate → join.
    """
    _ensure_conf(spark)
    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.operators import dedup, rollups, star

    sf_dir = "/root/testdata/sf0.001"
    fact = registry.normalized_fact(spark, sf_dir)
    deduped = dedup.keep_first(
        fact,
        ["AgentID", "FactDateKey", "MetricID"],
        [F.col("EventTime"), F.col("EventID")],
    )
    daily = rollups.daily_rollup(deduped)
    return rollups.goal_attainment(daily, star.build_dim_metric(spark))


def _wrap(fn: registry.Query) -> registry.Query:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_conf(spark)
        return fn(spark, sf_dir)

    return wrapped


# The driver's correctness sweep checks the FIRST 50 entries of queries() in
# iteration order. Round-13 rotation policy: (a) the full round-11-dated
# backlog — exactly the 45 keys of CORRECTNESS_r11.json minus the five
# re-checked as canaries in round 12 (ledger_gate_bloom, ledger_gate,
# ledger_update, within_batch_dedup, ingest_pipeline_full) — which would
# cross the two-round freshness boundary this round; (b) five
# round-12-green entries re-checked early because round-13 code changes
# touch their upstream paths AGAIN (streaming/pipeline.py's quarantine
# reclaim gains merge-on-rerun + gate-before-GC ordering; sinks.py's
# partitioned compact_ledger gains delete-verified counting, read_ledger
# gains the compaction-race lock, and the expiryDay derivation is pinned
# UTC — the modules hosting the ledger sink shared by ledger_gate /
# ledger_update / ledger_gate_bloom / within_batch_dedup semantics and
# the ingest graph of ingest_pipeline_full). (a)+(b) = exactly 50. Four
# (a) entries are engine-native approximate ops with no DuckDB oracle —
# rows-only BY DESIGN, each paired with an oracle-backed accuracy
# contract also in this window (approx_distinct_agents ↔
# approx_distinct_agents_check; value_percentiles_approx ↔
# value_percentiles_approx_check; ann_ivf_topk / ann_ivf_trained_topk ↔
# ann_ivf_recall, whose exact side is oracled); they are declared in
# _ROWS_ONLY_WINDOW_OK below. Every entry outside the window was
# driver-green in round 12 with unchanged code since;
# tools/check_oracle.py still sweeps all entries regardless of order.
_DRIVER_PRIORITY = [
    # -- (a) round-11-dated backlog hitting the two-round staleness boundary --
    "time_filter_yesterday",
    "time_filter_this_week",
    "time_filter_last_week",
    "time_filter_this_month",
    "time_filter_last_month",
    "value_percentiles",
    "hubspot_stub",
    "approx_distinct_agents_check",
    "value_percentiles_approx_check",
    "ann_cosine_topk",
    "ann_cosine_topk_vectorized",
    "corpus_shards",
    "corpus_stats_by_source",
    "decontamination_flags",
    "dedup_exact",
    "dim_agent_sync",
    "doc_fingerprint",
    "embedding_near_dup",
    "lang_id",
    "quality_scores",
    "repetition_stats",
    "rollup_grouping_sets",
    "sequence_packing",
    "stratified_sample",
    "token_counts",
    "tpch_q8_market_share",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_order_count_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_sole_late_supplier",
    "tpch_q22_idle_customers",
    "approx_distinct_agents",
    "value_percentiles_approx",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_ivf_recall",
    "frequent_tokens",
    "tpch_q10_returned_revenue",
    "tpch_q15_top_supplier",
    "dup_clusters",
    "dedup_survivors",
    "corpus_pipeline_full",
    "dedup_minhash_lsh",
    # -- (b) r12-green, re-checked early: round-13 code touches their paths --
    "ledger_gate_bloom",     # sinks.py read_ledger lock + UTC expiryDay pin
    "ledger_gate",           # same gate semantics, same modules
    "ledger_update",         # ledger claim cycle — compact_ledger count fix
    "within_batch_dedup",    # keep_first path inside the reworked sink module
    "ingest_pipeline_full",  # shares the ingest graph with streaming/pipeline
]

# In-window entries deliberately checked rows-only (no DuckDB oracle — the
# op is engine-native / approximate). Each has an oracle-backed accuracy
# contract also in the window: approx_distinct_agents ↔
# approx_distinct_agents_check (HLL vs exact distinct within rel-error);
# value_percentiles_approx ↔ value_percentiles_approx_check (t-digest vs
# exact percentiles); ann_ivf_topk and ann_ivf_trained_topk ↔
# ann_ivf_recall (recall ≥0.7 against the oracled exact top-k side). The
# two engine-native ops checked rows-only in round 12
# (multimodal_real_decode, embedding_near_dup_lsh) are round-12-green with
# their contracts and sit outside this window, so they must NOT appear
# here (the invariants test asserts the allowlist is exact).
_ROWS_ONLY_WINDOW_OK = {
    "approx_distinct_agents",
    "value_percentiles_approx",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north-star ops),
    ordered so the driver's 50-query cap yields maximum fresh coverage."""
    missing = [n for n in _DRIVER_PRIORITY if n not in registry.QUERIES]
    assert not missing, f"_DRIVER_PRIORITY references unknown queries: {missing}"
    ordered = {name: _wrap(registry.QUERIES[name]) for name in _DRIVER_PRIORITY}
    for name, fn in registry.QUERIES.items():
        if name not in ordered:
            ordered[name] = _wrap(fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (approximate/engine-native ops omitted
    → driver records the weaker rows-only check)."""
    return dict(registry.ORACLES)
