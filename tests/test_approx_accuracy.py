"""Accuracy bounds for the rows-only sketch queries: the driver checks them
rows-only (no SQL oracle), so error-vs-exact is asserted here instead."""

from __future__ import annotations

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES

from conftest import SF_ORACLE


def test_hll_distinct_within_relative_error(spark):
    """approx_count_distinct(rsd=0.01) must land within a conservative 5% of
    the exact distinct. The exact side lives in the oracle-backed contract
    row (approx_distinct_agents_check); the production query is sketch-only,
    so cross-check the two here."""
    checks = QUERIES["approx_distinct_agents_check"](spark, SF_ORACLE).collect()
    assert checks
    assert all(r.err_ok for r in checks), checks
    exact = {r.MetricID: r.exact_agents for r in checks}
    prod = {
        r.MetricID: r.approx_agents
        for r in QUERIES["approx_distinct_agents"](spark, SF_ORACLE).collect()
    }
    assert set(prod) == set(exact)
    for m, est in prod.items():
        assert exact[m] > 0
        assert abs(est - exact[m]) / exact[m] <= 0.05, (m, est, exact[m])


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
