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
# iteration order. Round-4 rotation policy: (a) the 13 queries whose round-3
# rows errored on the testdata timestamp_ntz change (fixed in
# sources/readers.load_table) need a fresh green verdict; (b) every query
# whose code changed this round (portable SimHash + its new oracle, the
# multi-table LSH rewrite, the two new recall-harness queries, and the
# persist→localCheckpoint conversions under the dedup/cluster family); (c)
# the round-1-only-green backlog (unchanged code, but per the driver contract
# their verdicts age out). 13 + 9 + 28 = 50; the 7 deferred stale entries
# (time_filter_yesterday/last_week/this_week/last_month/this_month,
# value_percentiles, hubspot_stub — trivial or same-function-family as
# in-window entries) rotate to the FRONT of round 5. Everything green in
# round 3 with unchanged code follows after rank 50; tools/check_oracle.py
# still sweeps all entries regardless of order.
_DRIVER_PRIORITY = [
    # -- (a) round-3 NTZ casualties, re-verified on the fixed reader ----------
    "adapter_normalize",
    "within_batch_dedup",
    "ledger_gate",
    "roster_gate",
    "ingest_pipeline_full",
    "daily_rollup",
    "pace_color",
    "star_join_enriched",
    "dim_shift_sync",
    "events_in_shift",
    "multi_source_union",
    "cumulative_agent_counts",
    "sessionize_events",
    # -- (b) code changed this round ------------------------------------------
    "simhash_near_dup",        # md5-portable fingerprint + new full oracle
    "ann_ivf_recall",          # new: recall harness (exact side oracled)
    "embedding_lsh_recall",    # new: recall harness (exact side oracled)
    "embedding_near_dup_lsh",  # multi-table Rademacher LSH rewrite
    "dedup_minhash_lsh",       # localCheckpoint conversion
    "dedup_ngram_jaccard",     # localCheckpoint conversion
    "dup_clusters",            # consumes the converted pair generators
    "semantic_dup_clusters",
    "dedup_survivors",
    # -- (c) round-1-only-green backlog ---------------------------------------
    "time_filter_today",
    "time_filter_custom_range",
    "goal_attainment",
    "dim_hints",
    "dim_date_seed",
    "dim_metric_sync",
    "ensure_dims_missing_dates",
    "run_counters",
    "ledger_update",
    "asof_last_purchase",
    "frequent_tokens",
    "region_revenue",
    "salted_metric_rollup",
    "top_customers_per_nation",
    "tpch_q1_pricing_summary",
    "tpch_q2_cheapest_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_delta",
    "tpch_q7_nation_trade_volume",
    "tpch_q9_profit_by_nation",
    "tpch_q10_returned_revenue",
    "tpch_q14_promo_revenue_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_variety",
    "tpch_q18_large_volume_customers",
    "tpch_q20_part_suppliers",
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
