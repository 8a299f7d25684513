"""Duplicate-cluster resolution and deterministic sampling operators."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import clustering


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_connected_components_basic(spark):
    # {1,2,3} chained, {10,11} pair, 5 only via reversed edge {5,4}.
    out = clustering.connected_components(
        _edges(spark, [(1, 2), (2, 3), (10, 11), (5, 4)])
    )
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 4: 4, 5: 4}


def test_connected_components_long_chain_converges(spark):
    # Path graph 0-1-2-...-9: worst case for label propagation (diameter 9).
    out = clustering.connected_components(
        _edges(spark, [(i, i + 1) for i in range(9)])
    )
    assert {r.cluster_id for r in out.collect()} == {0}


def test_connected_components_diameter_beyond_max_iter(spark):
    # Path graph of diameter 120 — plain min-propagation would need 120
    # rounds and, pre-fix, silently returned SPLIT clusters at max_iter=15.
    # Pointer jumping converges in ~log2(120) ≈ 7 rounds.
    out = clustering.connected_components(
        _edges(spark, [(i, i + 1) for i in range(120)])
    )
    got = {r.cluster_id for r in out.collect()}
    assert got == {0}


def test_connected_components_empty_edges(spark):
    out = clustering.connected_components(_edges(spark, []).filter("doc_a > 0"))
    assert out.count() == 0


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=20
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed label propagation must agree with a driver-side union-find
    on arbitrary small graphs (self-loops and duplicate edges included)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    out = clustering.connected_components(_edges(spark, edges))
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == expected


def test_attach_clusters_singletons_and_survivors(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (9, 50)], "doc_id long, n_chars long"
    )
    comp = clustering.connected_components(_edges(spark, [(1, 2), (2, 3)]))
    clustered = clustering.attach_clusters(docs, comp)
    assert {(r.doc_id, r.cluster_id) for r in clustered.collect()} == {
        (1, 1), (2, 1), (3, 1), (9, 9),
    }
    # Survivor: longest doc wins, tie (2 vs 3 at 300 chars) broken by min id.
    surv = {
        (r.cluster_id, r.doc_id, r.cluster_size)
        for r in clustering.canonical_survivors(clustered).collect()
    }
    assert surv == {(1, 2, 3), (9, 9, 1)}


def test_deterministic_sample_is_stable_and_subset(spark):
    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in clustering.deterministic_sample(docs, "doc_id", 30).collect()}
    b = {r.doc_id for r in clustering.deterministic_sample(docs, "doc_id", 30).collect()}
    wider = {
        r.doc_id for r in clustering.deterministic_sample(docs, "doc_id", 60).collect()
    }
    assert a == b                      # reproducible, no RNG
    assert a <= wider                  # monotone in pct: bucket < 30 ⊂ bucket < 60
    assert 0.2 < len(a) / 1000 < 0.4   # ~30%


def test_stratified_sample_rates_and_default(spark):
    docs = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "de")
            .otherwise("xx"),
        )
    )
    out = clustering.stratified_sample(
        docs, "doc_id", "lang", {"en": 100, "de": 50}, default_pct=0
    )
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == 1000          # 100% stratum kept whole
    assert 350 < by_lang.get("de", 0) < 650   # ~50%
    assert "xx" not in by_lang                # default 0% drops the stratum
