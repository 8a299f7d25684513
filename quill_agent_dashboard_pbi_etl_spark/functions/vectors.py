"""Vectorized (Arrow/numpy) embedding math — the Pandas-UDF fast lane.

The default similarity operators (operators/similarity.py) keep all math
JVM-side via higher-order functions, which wins for single-pass scoring. For
BLAS-heavy shapes (large query batches × high dimensions) a numpy matmul per
Arrow batch beats per-element codegen; this module provides that path with
identical semantics (cosine, rounded 6dp).

This is the ONLY Python-math hot path in the engine, and it is batch-
vectorized — never row-at-a-time (SURVEY.md §2.8).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_vs_query_matrix(
    corpus: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with a broadcast query matrix and per-batch numpy
    matmul: each Arrow batch of corpus vectors is scored against ALL queries
    in one (B×D)·(D×Q) product.

    Per-partition local top-k keeps only k rows per query per partition, so
    the final global top-k shuffles O(partitions·Q·k) rows — not the corpus.
    """
    out_schema = "query_id long, neighbor_id long, cosine_sim double"
    if not query_rows:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(None).cast("long")).select(
            "query_id", "neighbor_id", "rank", "cosine_sim"
        )
    qids = np.array([q[0] for q in query_rows], dtype=np.int64)
    qmat = np.array([q[1] for q in query_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # local (per-partition) top-k accumulator per query
        best: dict[int, list[tuple[float, int]]] = {int(q): [] for q in qids}
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if mat.size == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ qmat.T) / np.outer(norms, qnorm)  # B×Q
            sims = np.round(sims, 6)
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                mask = ids != qid  # exclude self-match
                for nid, s in zip(ids[mask], col[mask]):
                    best[int(qid)].append((float(s), int(nid)))
                # trim: keep k best by (sim desc, id asc)
                best[int(qid)] = sorted(best[int(qid)], key=lambda t: (-t[0], t[1]))[:k]
        rows = [
            {"query_id": qid, "neighbor_id": nid, "cosine_sim": s}
            for qid, lst in best.items()
            for s, nid in lst
        ]
        yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine_sim"])

    from pyspark.sql import Window

    local = corpus.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
