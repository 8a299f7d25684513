"""Materialization strategy dial (operators/materialize.pin)."""

from __future__ import annotations

from quill_agent_dashboard_pbi_etl_spark.operators.materialize import PIN_CONF, pin


def test_pin_default_is_local_checkpoint(spark):
    df = spark.range(10)
    out = pin(df)
    assert out is not df
    assert out.count() == 10
    # lineage is truncated: the checkpointed plan is a scan over materialized
    # blocks, with the original Range operator gone
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" not in plan
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan


def test_pin_none_passes_through_unless_required(spark):
    df = spark.range(10)
    spark.conf.set(PIN_CONF, "none")
    try:
        assert pin(df) is df  # pure lineage kept — recompute-safe
        required = pin(df, required=True)  # correctness sites still pin
        assert required is not df
        assert required.count() == 10
    finally:
        spark.conf.unset(PIN_CONF)


def test_pin_reliable_checkpoint(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(PIN_CONF, "checkpoint")
    try:
        out = pin(spark.range(10))
        assert out.count() == 10
        # the reliable checkpoint materialized to the configured dir
        assert any((tmp_path / "ckpt").iterdir())
    finally:
        spark.conf.unset(PIN_CONF)
