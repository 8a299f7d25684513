"""Decontamination and sequence-packing operator contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from quill_agent_dashboard_pbi_etl_spark.operators import corpus


def test_decontamination_counts_shared_distinct_shingles(spark):
    evals = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # 2 shared 3-grams
            (2, "alpha beta gamma"),            # 1 shared
            (3, "totally different words here"),  # 0 shared
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in corpus.decontamination_flags(docs, evals, min_overlap=2).collect()
    }
    assert out == {1: (2, True), 2: (1, False), 3: (0, False)}


def test_pack_sequences_layout_and_straddle(spark):
    rows = [(i, 0, n) for i, n in [(1, 300), (2, 300), (3, 100), (4, 0), (5, 50)]]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
    out = {
        r.doc_id: (r.start_offset, r.pack_id, r.straddles)
        for r in corpus.pack_sequences(
            df, "shard", "doc_id", "n_tokens", context_len=512
        ).collect()
    }
    assert out[1] == (0, 0, False)      # [0, 300)
    assert out[2] == (300, 0, True)     # [300, 600) crosses 512
    assert out[3] == (600, 1, False)    # [600, 700)
    assert out[4] == (700, 1, False)    # empty doc never straddles
    assert out[5] == (700, 1, False)


def test_pack_sequences_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(1, 0, 500), (2, 1, 500), (3, 0, 500), (4, 1, 500)],
        "doc_id long, shard long, n_tokens long",
    )
    out = corpus.pack_sequences(df, "shard", "doc_id", "n_tokens", 512)
    # each shard starts its own offset space at 0
    firsts = (
        out.groupBy("shard").agg(F.min("start_offset").alias("m")).collect()
    )
    assert all(r.m == 0 for r in firsts)
