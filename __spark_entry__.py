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
# iteration order. Round-8 rotation policy: (a) the full round-6-dated
# backlog — exactly the 45 keys of CORRECTNESS_r06.json minus the five
# re-checked as canaries in round 7 (semantic_dup_clusters, dup_clusters,
# dedup_survivors, corpus_pipeline_full, ledger_gate_bloom) — which would
# cross the two-round freshness boundary this round; (b) five round-7-green
# entries re-checked early because round-8 code changes touch their upstream
# paths (functions/multimodal.py codec-lane vectorization feeds
# multimodal_real_decode and multimodal_features; the joint auto (bits,
# tables) LSH shape in operators/similarity.py feeds embedding_near_dup_lsh
# and its recall contract embedding_lsh_recall; semantic_dup_clusters
# shares the similarity pair kernel). (a)+(b) = exactly 50. Every entry
# outside the window was driver-green in round 7 with unchanged code since;
# tools/check_oracle.py still sweeps all entries regardless of order. Two
# (b) entries are engine-native approximate ops with no DuckDB oracle —
# their freshness check is rows-only BY DESIGN (each is paired with an
# oracle-backed accuracy contract: embedding_near_dup_lsh ↔
# embedding_lsh_recall in this window; multimodal_real_decode ↔ the
# golden-value codec fixtures plus the three-lane differential tests in
# tests/test_multimodal_codecs.py); they are declared in
# _ROWS_ONLY_WINDOW_OK below.
_DRIVER_PRIORITY = [
    # -- (a) round-6-dated backlog hitting the two-round staleness boundary --
    "quality_drift_by_source",
    "fact_error_log",
    "frequent_tokens_cms_check",
    "quality_filter",
    "adapter_normalize",
    "within_batch_dedup",
    "ledger_gate",
    "roster_gate",
    "run_counters",
    "dim_hints",
    "ledger_update",
    "ingest_pipeline_full",
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
    "dedup_minhash_lsh",
    "simhash_near_dup",
    "sessionize_events",
    # -- (b) r7-green, re-checked early: round-8 code touches their paths ----
    "multimodal_real_decode",     # PNG unfilter vectorization + C lane
    "multimodal_features",        # same module: fake-decode feature lane
    "embedding_near_dup_lsh",     # joint auto (bits, tables) LSH shape
    "embedding_lsh_recall",       # its oracle-backed recall contract
    "semantic_dup_clusters",      # shared similarity pair kernel
]

# In-window entries deliberately checked rows-only (no DuckDB oracle — the
# op is engine-native/approximate). Each has an oracle-backed accuracy
# contract also in the window: embedding_near_dup_lsh ↔ embedding_lsh_recall;
# multimodal_real_decode ↔ golden-value codec fixtures + three-lane
# differential tests in pytest. The other four rows-only ops
# (approx_distinct_agents, value_percentiles_approx, ann_ivf_topk,
# ann_ivf_trained_topk) are round-7-green with unchanged code and sit
# outside this window, so they must NOT appear here (the invariants test
# asserts the allowlist is exact).
_ROWS_ONLY_WINDOW_OK = {
    "embedding_near_dup_lsh",
    "multimodal_real_decode",
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
