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


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=12
).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(
    corpus_texts=st.lists(_words, min_size=1, max_size=8),
    eval_texts=st.lists(_words, min_size=1, max_size=3),
)
def test_decontamination_matches_set_model(spark, corpus_texts, eval_texts):
    """Spark overlap counts must equal a driver-side distinct-3-gram set
    intersection for arbitrary tiny corpora (incl. docs too short to shingle)."""

    def tri(text):
        toks = [t for t in text.split() if t]
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}

    eval_sh = set().union(*(tri(t) for t in eval_texts)) if eval_texts else set()
    expected = {
        i: len(tri(t) & eval_sh) for i, t in enumerate(corpus_texts)
    }

    from quill_agent_dashboard_pbi_etl_spark.operators import corpus

    docs = spark.createDataFrame(
        list(enumerate(corpus_texts)), "doc_id long, text string"
    )
    evals = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(eval_texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_overlap
        for r in corpus.decontamination_flags(docs, evals, min_overlap=1).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 700), min_size=1, max_size=12),
    ctx=st.sampled_from([128, 512]),
)
def test_pack_sequences_matches_cumsum_model(spark, tokens, ctx):
    """Layout must equal the driver-side running-sum model: contiguous
    offsets, pack ids from the start offset, straddle iff the doc crosses a
    context boundary."""
    from quill_agent_dashboard_pbi_etl_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, 0, n) for i, n in enumerate(tokens)],
        "doc_id long, shard long, n_tokens long",
    )
    got = {
        r.doc_id: (r.start_offset, r.pack_id, r.straddles)
        for r in corpus.pack_sequences(df, "shard", "doc_id", "n_tokens", ctx).collect()
    }
    start = 0
    for i, n in enumerate(tokens):
        straddle = n > 0 and (start + n - 1) // ctx != start // ctx
        assert got[i] == (start, start // ctx, straddle)
        start += n


def test_repetition_stats_short_and_empty_docs(spark, monkeypatch, tmp_path):
    """Sub-2-token docs must yield zero-gram rows, not crash (the
    sequence(0,-1) regression) — driven through the registered query."""
    import quill_agent_dashboard_pbi_etl_spark.plans.extensions  # noqa: F401
    from quill_agent_dashboard_pbi_etl_spark.plans import registry

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two tokens"), (4, "a a a a")],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r.doc_id: (r.total_2grams, r.dup_2gram_frac, r.top_2gram_coverage)
        for r in registry.QUERIES["repetition_stats"](spark, sf).collect()
    }
    assert out[1] == (0, 0.0, 0.0)
    assert out[2] == (0, 0.0, 0.0)
    assert out[3] == (1, 0.0, 1.0)
    assert out[4] == (3, round(1 - 1 / 3, 6), 1.0)  # "a a" ×3
