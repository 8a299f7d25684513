"""Bucketed-table co-located joins (operators/bucketing.py): after writing
both join sides bucketed by the key, the join must plan with no Exchange on
either side — the shuffle-free path that matters at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from quill_agent_dashboard_pbi_etl_spark.sources.readers import load_table

from conftest import SF_SMALL


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plans_without_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    write_bucketed(
        orders,
        "bkt_orders",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
        path=str(tmp_path / "orders"),
    )
    write_bucketed(
        lineitem,
        "bkt_lineitem",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
        path=str(tmp_path / "lineitem"),
    )

    assert bucketed_join_is_shuffle_free(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")

    # And the join is still correct: row count equals the plain-join count.
    bucketed_n = (
        spark.table("bkt_orders").join(spark.table("bkt_lineitem"), "o_orderkey").count()
    )
    plain_n = orders.join(lineitem, "o_orderkey").count()
    assert bucketed_n == plain_n

    # Control: joining a bucketed table to an UN-bucketed frame does shuffle.
    plan = (
        spark.table("bkt_orders")
        .join(lineitem, "o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
