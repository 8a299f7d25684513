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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north-star ops)."""
    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (approximate/engine-native ops omitted
    → driver records the weaker rows-only check)."""
    return dict(registry.ORACLES)
