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
# iteration order. Round-6 rotation policy: (a) the ONLY never-driver-checked
# entry (quality_drift_by_source, registered round 5 outside the window)
# leads; (b) the five round-5-green entries whose upstream code changed AFTER
# the round-5 driver run — the pinned-timestamp-family extension
# (fact_error_log exercises the reject side), the hex Bloom-literal encoding
# (ledger_gate_bloom), the union-bound-safe CMS slack
# (frequent_tokens_cms_check), the shared quality-gate refactor
# (quality_filter), and the merged CC round-0+1 step (corpus_pipeline_full
# composes clustering + the quality gate); (c) the full round-4-green backlog
# — all 44 entries whose latest verdict is r4-dated and would cross the
# two-round freshness boundary this round (the P-family via adapter_normalize
# and ingest_pipeline_full also re-exercises the extended timestamp family;
# dup_clusters / dedup_survivors / semantic_dup_clusters re-exercise the
# merged CC step). (a)+(b)+(c) = exactly 50. Every entry outside the window
# was driver-green in round 5 with unchanged code since; tools/check_oracle.py
# still sweeps all entries regardless of order.
_DRIVER_PRIORITY = [
    # -- (a) never driver-checked --------------------------------------------
    "quality_drift_by_source",
    # -- (b) r5-green but code changed after the r5 driver run ----------------
    "fact_error_log",             # extended pinned timestamp family (errors.py)
    "ledger_gate_bloom",          # hex bitmap literal (dedup.py)
    "frequent_tokens_cms_check",  # union-bound-safe slack (registry.py)
    "quality_filter",             # shared gate dict (extensions.py/text.py)
    "corpus_pipeline_full",       # merged CC round 0+1 + shared gate
    # -- (c) round-4-green backlog hitting the two-round staleness boundary ---
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
    "dup_clusters",
    "dedup_survivors",
    "semantic_dup_clusters",
]


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
