"""Registry-WIDE physical-plan invariant sweep.

test_plan_quality.py pins deep properties on hand-picked queries; this file
asserts the cheap global invariants on EVERY registry query's compiled plan
(plan-only — nothing executes), so a regression anywhere in the 95-query
surface fails the suite even if no targeted test covers that query:

- no CartesianProduct, ever — an accidental unkeyed join at 100 TB is a
  job-killer, and no registry query needs one;
- BroadcastNestedLoopJoin only where it is the DESIGN (a deliberately tiny
  broadcast side: ANN query sets, IVF centroid probes, LSH recall
  harnesses, q15's max-join) — the allowlist is explicit so a new BNLJ
  sneaking into any other query fails loudly;
- no row-at-a-time Python (BatchEvalPython) anywhere — Python is allowed
  ONLY in Arrow form (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas)
  and only where the operator is genuinely Python-backed.

The sweep builds the plan at the tiny SF so it runs in seconds.
"""

from __future__ import annotations

import pytest

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES

from conftest import SF_SMALL

# Queries whose plan legitimately contains BroadcastNestedLoopJoin: every
# entry is a deliberate tiny-broadcast-side design, documented in the query
# or operator docstring. Anything NOT listed here must stay BNLJ-free.
BNLJ_BY_DESIGN = {
    "ann_cosine_topk",       # corpus × broadcast(5 query vectors)
    "ann_ivf_topk",          # query probe against broadcast centroid set
    "ann_ivf_trained_topk",  # same, trained centroids
    "ann_ivf_recall",        # recall harness embeds the brute-force side
    "frequent_tokens_cms_check",  # contract row × broadcast exact-count row
    "dim_shift_sync",        # DimShift seed IS distinct-agents × calendar-days
    "events_in_shift",       # builds the same DimShift seed inline
    "pace_color",            # same DimShift seed feeds shift-elapsed pace
    "run_counters",          # processed/inserted single-row counters crossed
    "tpch_q22_idle_customers",  # scalar avg-acctbal subquery × customer rows
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_global_plan_invariants(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    # Deliberately the INITIAL plan: nothing has executed here, so under AQE
    # executedPlan() is the pre-runtime-reoptimization plan. For THESE guards
    # that is the right object — AQE only ever swaps join strategies downward
    # (e.g. SMJ → broadcast); it never INTRODUCES CartesianProduct /
    # BatchEvalPython / BroadcastNestedLoopJoin nodes absent from the initial
    # plan — and it keeps the 95-query sweep collect-free. Do not "fix" this
    # into a collect-first test.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: unkeyed cartesian join"
    if name not in BNLJ_BY_DESIGN:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: BroadcastNestedLoopJoin outside the by-design "
            "allowlist — either key the join or document and allowlist it"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF — use Arrow (pandas_udf / "
        "mapInPandas) or a JVM expression"
    )


def test_nd_barrier_keeps_consumer_filters_above_spreading_exchange(spark):
    """r15 regression guard (VERDICT r14 what's-wrong 2): the adapter chain's
    `_nd_barrier` must keep derived-column consumer filters ABOVE the
    ensure_min_partitions round-robin exchange — and the barrier expression
    itself must survive optimization (two earlier spellings were silently
    constant-folded away; a Spark upgrade could fold this one too, which this
    test would catch). With the escape hatch off, pushdown must return —
    proving the flag actually controls the plan."""
    from quill_agent_dashboard_pbi_etl_spark.plans import registry
    from quill_agent_dashboard_pbi_etl_spark.sources.webhook_mapping import (
        ND_BARRIER_CONF,
    )

    def fact_plan() -> str:
        registry._FACT_PLAN_CACHE.clear()  # memo keyed per session, not per conf
        df = registry.normalized_fact(spark, SF_SMALL).filter("MetricID = 'CALLS'")
        registry._FACT_PLAN_CACHE.clear()
        return df._jdf.queryExecution().executedPlan().toString()

    plan_on = fact_plan()
    # 1. barrier alive: the shuffle(array(...)) marker survived optimization
    assert "shuffle(array(" in plan_on, "nd-barrier folded away by the optimizer"
    # 2. the spreading exchange exists on single-file inputs...
    assert "RoundRobinPartitioning" in plan_on
    # 3. ...and NO derived-column consumer predicate sits below it (children
    # print after the parent in the tree string, so everything past the
    # round-robin exchange is its scan-side subtree).
    below = plan_on[plan_on.index("RoundRobinPartitioning"):]
    for marker in ("Contains(lower(", "MetricID", "is_outbound"):
        assert marker not in below, (
            f"consumer predicate ({marker}) pushed below the spreading "
            "exchange — the single-task-scan-stage regression is back"
        )

    spark.conf.set(ND_BARRIER_CONF, "off")
    try:
        plan_off = fact_plan()
    finally:
        spark.conf.unset(ND_BARRIER_CONF)
    assert "shuffle(array(" not in plan_off, "escape hatch did not disable the barrier"
