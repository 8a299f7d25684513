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
# iteration order. Round-14 rotation policy: (a) the full round-12-dated
# backlog — exactly the 45 keys of CORRECTNESS_r12.json minus the five
# re-checked as canaries in round 13 — which would cross the two-round
# freshness boundary this round; (b) the same five canaries AGAIN,
# because round-14 code changes touch exactly the same three modules a
# third round running (streaming/pipeline.py's verify read-back becomes a
# range prune — the ADVICE r13 midnight-replay fix — and the sink's
# partition flag goes three-valued; sinks.py gains the durable layout
# marker; operators/dedup.py routes ledger_gate / ledger_update_atomic
# through the shared gate_anti_join flip-regime selector). (a)+(b) =
# exactly 50. Two (a) entries are engine-native ops with no DuckDB
# oracle — rows-only BY DESIGN, each paired with an oracle-backed
# contract in the same window (multimodal_real_decode ↔
# multimodal_features, the deterministic feature side of the same decode
# plumbing; embedding_near_dup_lsh ↔ embedding_lsh_recall, whose exact
# side is oracled); they are declared in _ROWS_ONLY_WINDOW_OK below.
# Every entry outside the window was driver-green in round 13 with
# unchanged code since; tools/check_oracle.py still sweeps all entries
# regardless of order.
_DRIVER_PRIORITY = [
    # -- (a) round-12-dated backlog hitting the two-round staleness boundary --
    "quality_drift_by_source",
    "fact_error_log",
    "frequent_tokens_cms_check",
    "quality_filter",
    "adapter_normalize",
    "roster_gate",
    "run_counters",
    "dim_hints",
    "time_filter_today",
    "daily_rollup",
    "salted_metric_rollup",
    "goal_attainment",
    "pace_color",
    "dim_date_seed",
    "time_filter_custom_range",
    "star_join_enriched",
    "ensure_dims_missing_dates",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "region_revenue",
    "tpch_q6_revenue_delta",
    "tpch_q4_order_priority",
    "tpch_q9_profit_by_nation",
    "top_customers_per_nation",
    "tpch_q5_local_supplier_volume",
    "tpch_q16_supplier_part_variety",
    "tpch_q18_large_volume_customers",
    "multi_source_union",
    "cumulative_agent_counts",
    "dim_metric_sync",
    "dim_shift_sync",
    "asof_last_purchase",
    "events_in_shift",
    "tpch_q2_cheapest_supplier",
    "tpch_q7_nation_trade_volume",
    "tpch_q20_part_suppliers",
    "tpch_q14_promo_revenue_share",
    "dedup_ngram_jaccard",
    "simhash_near_dup",
    "sessionize_events",
    "multimodal_real_decode",
    "multimodal_features",
    "embedding_near_dup_lsh",
    "embedding_lsh_recall",
    "semantic_dup_clusters",
    # -- (b) r13-green, re-checked early: round-14 code touches their paths --
    "ledger_gate_bloom",     # dedup.py gate selector refactor (gate_anti_join)
    "ledger_gate",           # now routes through the flip-regime selector
    "ledger_update",         # claim cycle — sinks.py layout marker, sink flag
    "within_batch_dedup",    # keep_first path inside the reworked sink module
    "ingest_pipeline_full",  # shares the ingest graph with streaming/pipeline
]

# In-window entries deliberately checked rows-only (no DuckDB oracle — the
# op is engine-native). Each has an oracle-backed contract also in the
# window: multimodal_real_decode ↔ multimodal_features (same decode
# plumbing, deterministic feature side oracled; the real-decode golden
# vectors live in pytest); embedding_near_dup_lsh ↔ embedding_lsh_recall
# (recall contract against the oracled exact near-dup side). The four
# approximate ops checked rows-only in round 13 (approx_distinct_agents,
# value_percentiles_approx, ann_ivf_topk, ann_ivf_trained_topk) are
# round-13-green with their contracts and sit outside this window, so
# they must NOT appear here (the invariants test asserts the allowlist
# is exact).
_ROWS_ONLY_WINDOW_OK = {
    "multimodal_real_decode",
    "embedding_near_dup_lsh",
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
