"""End-to-end corpus-prep composition: the training-data pipeline stages
(quality gate → near-dup clustering → canonical survivors → deterministic
sample → shard) must compose as one DataFrame graph over real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import clustering, dedup
from quill_agent_dashboard_pbi_etl_spark.sources.readers import load_table

from conftest import SF_SMALL


def test_full_corpus_prep_pipeline_composes(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    n_in = docs.count()

    # 1. near-dup pairs → duplicate clusters → one survivor per cluster
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    comp = clustering.connected_components(pairs)
    clustered = clustering.attach_clusters(docs, comp)
    survivors = clustering.canonical_survivors(clustered)

    n_clusters = clustered.select("cluster_id").distinct().count()
    assert survivors.count() == n_clusters  # exactly one doc per cluster
    # every duplicate removed is accounted for by its cluster's size
    assert (
        survivors.agg(F.sum("cluster_size")).first()[0] == n_in
    )

    # 2. deterministic per-language downsample of the deduped corpus
    sampled = clustering.stratified_sample(
        survivors, "doc_id", "lang", {"en": 100}, default_pct=50
    )
    n_sampled = sampled.count()
    assert 0 < n_sampled <= n_clusters
    # en stratum passes whole
    assert (
        sampled.filter(F.col("lang") == "en").count()
        == survivors.filter(F.col("lang") == "en").count()
    )

    # 3. shard + write the final corpus partitioned by shard
    out = sampled.withColumn("shard", clustering.hash_bucket(F.col("doc_id"), 8))
    path = str(tmp_path / "corpus")
    out.write.partitionBy("shard").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == n_sampled
    # shard column survived as partition dir and rows are where they hash to
    mismatch = back.withColumn(
        "expect", clustering.hash_bucket(F.col("doc_id"), 8)
    ).filter(F.col("shard") != F.col("expect"))
    assert mismatch.count() == 0
