"""Accuracy bounds for the rows-only sketch queries: the driver checks them
rows-only (no SQL oracle), so error-vs-exact is asserted here instead."""

from __future__ import annotations

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES

from conftest import SF_ORACLE


def test_hll_distinct_within_relative_error(spark):
    """approx_count_distinct(rsd=0.01) must land within a conservative 5%
    of the exact distinct it is computed alongside (HLL++ guarantees ~1%)."""
    rows = QUERIES["approx_distinct_agents"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.exact_agents > 0
        rel = abs(r.approx_agents - r.exact_agents) / r.exact_agents
        assert rel <= 0.05, (r.MetricID, r.approx_agents, r.exact_agents)


def test_tdigest_percentiles_track_exact(spark):
    """approx_percentile(accuracy=10000) per event_type must sit inside the
    exact group's value range and within 2% relative of the exact quantile."""
    exact = {
        r.event_type: r for r in QUERIES["value_percentiles"](spark, SF_ORACLE).collect()
    }
    approx = QUERIES["value_percentiles_approx"](spark, SF_ORACLE).collect()
    assert set(exact) == {r.event_type for r in approx}
    for r in approx:
        e = exact[r.event_type]
        assert r.n == e.n
        for q in ("p50", "p95", "p99"):
            ev, av = getattr(e, q), getattr(r, q)
            denom = max(abs(ev), 1e-9)
            assert abs(av - ev) / denom <= 0.02, (r.event_type, q, av, ev)
        # monotone percentiles
        assert r.p50 <= r.p95 <= r.p99
