"""Physical-plan regressions: the properties that make these queries viable
at 100 TB must hold in the compiled plan, not just in intent — predicate
pushdown into the parquet scan, column pruning, broadcast of small dims, and
zero Python evaluation in reference-parity paths."""

from __future__ import annotations

import pytest

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES

from conftest import SF_SMALL


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filters_pushed_to_scan(spark):
    txt = formatted(QUERIES["tpch_q6_revenue_delta"](spark, SF_SMALL))
    assert "PushedFilters" in txt
    # every conjunct reaches the reader
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in txt or col in txt.split("PushedFilters")[1].split("\n")[0]


def test_q6_scan_prunes_columns(spark):
    txt = formatted(QUERIES["tpch_q6_revenue_delta"](spark, SF_SMALL))
    read_schema = [l for l in txt.splitlines() if "ReadSchema" in l][0]
    # 4 needed columns only — a scan reading l_comment-style extras is wrong
    assert "l_extendedprice" in read_schema and "l_shipdate" in read_schema
    for unused in ("l_returnflag", "l_orderkey", "l_partkey", "l_tax"):
        assert unused not in read_schema


def test_adapter_scan_prunes_unused_event_columns(spark):
    txt = formatted(QUERIES["adapter_normalize"](spark, SF_SMALL))
    read_schema = [l for l in txt.splitlines() if "ReadSchema" in l][0]
    assert "value" not in read_schema  # never referenced by the adapter


def test_star_join_broadcasts_dims(spark):
    p = plan_of(QUERIES["star_join_enriched"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # no dim is big enough to justify one


def test_goal_attainment_broadcasts_dim_metric(spark):
    p = plan_of(QUERIES["goal_attainment"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in p


@pytest.mark.parametrize(
    "name",
    [
        "adapter_normalize",
        "within_batch_dedup",
        "ledger_gate",
        "roster_gate",
        "daily_rollup",
        "goal_attainment",
        "pace_color",
        "star_join_enriched",
        "ingest_pipeline_full",
        "dim_date_seed",
        "time_filter_today",
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
    ],
)
def test_parity_paths_have_no_python_eval(spark, name):
    """SURVEY.md §2.8: zero Python UDFs in reference-parity plans — everything
    stays JVM-side/whole-stage-codegen."""
    p = plan_of(QUERIES[name](spark, SF_SMALL))
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p


def test_parity_paths_use_whole_stage_codegen(spark):
    # AQE defers codegen planning until runtime; disable it to see the spans.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan_of(QUERIES["tpch_q1_pricing_summary"](spark, SF_SMALL))
        # `*(N)` prefixes mark whole-stage-codegen spans; filter, project and
        # partial aggregate must all fuse into span 1 above the scan.
        for op in ("*(1) HashAggregate", "*(1) Project", "*(1) Filter"):
            assert op in p, p[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_rollup_plan_has_partial_aggregation(spark):
    """daily_rollup must map-side combine: two HashAggregates around one
    Exchange (partial + final), so only group keys shuffle, not events."""
    p = plan_of(QUERIES["daily_rollup"](spark, SF_SMALL))
    assert p.count("HashAggregate") >= 2
    before, _, after = p.partition("Exchange")
    assert "HashAggregate" in before and "HashAggregate" in after


def test_date_partitioned_fact_prunes_partitions(spark, tmp_path):
    """SCALE.md global posture: a date filter on the partitioned fact table
    must become a PartitionFilter (directory pruning), reading zero bytes of
    other days — the property every A7 time-filter preset relies on."""
    from pyspark.sql import functions as F

    from quill_agent_dashboard_pbi_etl_spark.plans.registry import normalized_fact
    from quill_agent_dashboard_pbi_etl_spark.sinks import append_fact

    fact = normalized_fact(spark, SF_SMALL)
    append_fact(fact, str(tmp_path / "fact"))

    read = spark.read.parquet(str(tmp_path / "fact")).filter(
        F.col("FactDateKey") == "2024-01-15"
    )
    txt = formatted(read)
    part_line = [l for l in txt.splitlines() if "PartitionFilters" in l][0]
    assert "FactDateKey" in part_line  # filter hit the directory level
    # and the data filters are empty — nothing left to evaluate per row
    n_days_read = read.select("FactDateKey").distinct().count()
    assert n_days_read <= 1


def test_stratified_sample_filter_stays_in_scan_stage(spark):
    """The md5-bucket filter must be row-local: no Exchange (shuffle), no
    Python eval, and the scan reads only the referenced columns."""
    df = QUERIES["stratified_sample"](spark, SF_SMALL)
    p = plan_of(df)
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    read_schema = [l for l in formatted(df).splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema  # sampling never touches the payload


def test_corpus_shards_has_partial_aggregation(spark):
    """Shard stats must map-side combine: 2 HashAggregates around 1 shuffle."""
    df = QUERIES["corpus_shards"](spark, SF_SMALL)
    df.collect()  # let AQE finalize
    p = plan_of(df)
    assert p.count("HashAggregate") >= 2
    read_schema = [l for l in formatted(df).splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema and "lang" not in read_schema


@pytest.mark.parametrize("name", ["frequent_tokens", "tpch_q10_returned_revenue"])
def test_global_topk_is_take_ordered(spark, name):
    """Global top-k queries must compile to TakeOrderedAndProject
    (per-partition heaps merged on the driver) — NOT a window over a
    single-partition sort exchange, whose viability depends on the
    WindowGroupLimit optimizer rule firing."""
    df = QUERIES[name](spark, SF_SMALL)
    p = plan_of(df)
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_q15_max_join_keeps_ties_no_global_sort(spark):
    """tpch_q15's '= max' is a broadcast join against the aggregate max —
    no global-window sort exchange, no nested-loop, and the max side
    actually broadcasts."""
    df = QUERIES["tpch_q15_top_supplier"](spark, SF_SMALL)
    p = plan_of(df)
    assert "Window" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
