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
# iteration order. Round-5 rotation policy: (a) never-verified / repaired /
# round-1-stale entries first — fact_error_log (first-ever driver row for the
# dead-letter operator), the two LSH queries repaired this round (the
# _block_pairs_fn fix), the 7 entries deferred from round 4, and the two new
# sketch error-bound contract rows; (b) the round-3-green backlog (verdicts
# age out after two rounds — every r3-green entry gets a fresh row); (c) the
# declared no-oracle tier, refreshed rows-only; (d) queries whose upstream
# code changed this round (similarity.py pair kernel → the cluster family;
# top-k limit form → frequent_tokens/q10/q15) plus the two operators NEW
# this round (Bloom ledger pre-gate — exact-result scan reduction — and the
# count-min-sketch error-bound contract; the composed corpus_pipeline_full).
# dedup_minhash_lsh/_ngram_jaccard/semantic_dup_clusters (r4-green; their
# changed pin()/pair-kernel paths are exercised in-window by the cluster
# family that consumes the same pinned pipelines) yield their slots to the
# new rows. Everything green in round 4 with unchanged code follows after
# rank 50; tools/check_oracle.py still sweeps all entries regardless of
# order.
_DRIVER_PRIORITY = [
    # -- (a) never-verified / repaired / stale-first --------------------------
    "fact_error_log",          # first driver row (registered r4, oracle-green in pytest)
    "embedding_lsh_recall",    # repaired: _block_pairs_fn now defined
    "embedding_near_dup_lsh",  # repaired: _block_pairs_fn now defined
    "time_filter_yesterday",
    "time_filter_this_week",
    "time_filter_last_week",
    "time_filter_this_month",
    "time_filter_last_month",
    "value_percentiles",
    "hubspot_stub",
    "approx_distinct_agents_check",    # new: HLL 5%-error contract row
    "value_percentiles_approx_check",  # new: t-digest 1%-rank-error contract row
    # -- (b) round-3-green backlog (verdicts aging out) -----------------------
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
    "multimodal_features",
    "quality_filter",
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
    # -- (c) declared no-oracle tier, rows-only refresh -----------------------
    "approx_distinct_agents",
    "value_percentiles_approx",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "multimodal_real_decode",
    # -- (d) upstream code changed this round / new this round ----------------
    "corpus_pipeline_full",    # new: composed training-data prep, full oracle
    "ann_ivf_recall",          # similarity.py changed this round
    "frequent_tokens",         # top-k limit form
    "tpch_q10_returned_revenue",
    "tpch_q15_top_supplier",
    "ledger_gate_bloom",         # new: Bloom pre-gate, exact-oracle (ledger_gate's)
    "frequent_tokens_cms_check",  # new: CMS error-bound contract row
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
