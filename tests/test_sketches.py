"""Count-min sketch contracts (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import sketches


def _stream(spark):
    # skewed stream: key k appears k times (1..50) → 1275 rows
    rows = [(f"k{k}",) for k in range(1, 51) for _ in range(k)]
    return spark.createDataFrame(rows, "key string")


def test_cms_never_underestimates_and_bounded(spark):
    df = _stream(spark)
    counters = sketches.cms_counters(df, "key")
    est = {
        r.key: r.cms_est
        for r in sketches.cms_estimate(df, counters, "key").collect()
    }
    true = {f"k{k}": k for k in range(1, 51)}
    n = sum(true.values())
    slack = int(2.72 / 8192 * n) + 1
    for k, t in true.items():
        assert est[k] >= t, f"CMS underestimated {k}: {est[k]} < {t}"
        assert est[k] <= t + slack, f"CMS overflow {k}: {est[k]} > {t}+{slack}"


def test_cms_counter_table_is_bounded_and_mergeable(spark):
    """The sketch's size is depth×width regardless of cardinality, and the
    counter table of a union equals the summed counter tables — the property
    that makes it a pre-aggregable, cross-batch-mergeable structure."""
    a = _stream(spark)
    b = spark.createDataFrame([(f"z{k}",) for k in range(200)], "key string")
    ca = sketches.cms_counters(a, "key", depth=2, width=64)
    cb = sketches.cms_counters(b, "key", depth=2, width=64)
    assert ca.count() <= 2 * 64

    merged_tables = (
        ca.unionByName(cb)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    from_union = sketches.cms_counters(a.unionByName(b), "key", depth=2, width=64)
    lhs = {(r.seed, r.bucket): r.cnt for r in merged_tables.collect()}
    rhs = {(r.seed, r.bucket): r.cnt for r in from_union.collect()}
    assert lhs == rhs
