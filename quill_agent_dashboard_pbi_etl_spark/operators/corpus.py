"""Corpus-assembly operators: benchmark decontamination and sequence packing.

North-star extensions (BASELINE.json §7 scope). Both are the standard last
steps of a training-data pipeline:

- **Decontamination**: flag corpus documents that share n-gram shingles with
  an evaluation/benchmark set, so eval data never leaks into training data.
  Shape: shingle both sides → distinct-shingle equi-join → per-doc overlap
  count. The eval side is tiny (a benchmark suite), so its shingle set
  broadcasts; the corpus side streams through map-side — no corpus-sized
  shuffle at 100 TB.
- **Sequence packing**: concatenate documents in a deterministic order and
  cut at every ``context_len`` tokens (the GPT-style pretraining layout).
  Each doc gets its start offset and pack id from ONE cumulative-sum window
  per shard — no stateful scan, no driver loop; shards bound window state
  and are the parallelism unit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles


def decontamination_flags(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Per corpus doc: how many distinct ``shingle_n``-gram shingles it shares
    with ANY eval doc, and whether that crosses ``min_overlap`` (contaminated).

    Every corpus doc is returned (zero-overlap docs included) so the output
    is a complete audit column, joinable back onto the corpus.
    """
    from ..sources.readers import ensure_min_partitions

    eval_sh = (
        eval_set.select(
            F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle")
        )
        .distinct()
    )
    # Shingling is the CPU-heavy stage: spread a narrow single-file scan
    # across cores first (no-op on a real many-file layout).
    corpus_sh = ensure_min_partitions(corpus).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    overlap = (
        corpus_sh.join(eval_sh, "shingle")  # eval side broadcasts (tiny)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return corpus.select(id_col).join(overlap, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap).alias(
            "contaminated"
        ),
    )


def pack_sequences(
    docs_with_tokens: DataFrame,
    shard_col: str,
    order_col: str,
    token_col: str,
    context_len: int = 2048,
) -> DataFrame:
    """Concat-and-split packing: within each shard, documents are laid out in
    ``order_col`` order; each doc's ``start_offset`` is the running token
    count before it, ``pack_id`` the context window its first token lands in,
    and ``straddles`` whether it crosses a window boundary.

    Deterministic given (shard, order) — re-runs produce identical layouts,
    which is what makes packed pretraining data reproducible.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs_with_tokens.select(
        "*",
        start.alias("start_offset"),
        F.floor(start / context_len).alias("pack_id"),
        F.when(
            F.col(token_col) > 0,
            F.floor((start + F.col(token_col) - 1) / context_len)
            != F.floor(start / context_len),
        )
        .otherwise(F.lit(False))
        .alias("straddles"),
    )
