"""North-star LLM-data-pipeline queries (BASELINE.json): dedup, similarity
search, text analysis over the documents/embeddings tables.

Registered into the same QUERIES/ORACLES dicts as the parity queries.
Near-dup hashing uses md5 (portable) so even MinHash keeps a SQL oracle;
SimHash/IVF variants use engine-native hashes and register rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import clustering, dedup, similarity
from ..sources.readers import load_table
from .registry import register

# Normalized-text SQL fragment (mirror of operators.dedup.normalize_text).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# 3-gram shingle list over normalized tokens (mirror of operators.dedup.shingles).
_SHINGLES_CTE = f"""
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(greatest(len(toks) - 2, 0)),
           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
         ))) AS shingle
  FROM (SELECT doc_id, str_split({_NORM}, ' ') AS toks FROM documents)
)
""".strip()


@register(
    "dedup_exact",
    f"""
SELECT md5({_NORM}) AS content_hash, min(doc_id) AS doc_id
FROM documents GROUP BY content_hash
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep lowest doc_id per md5(normalized text) — the cheapest
    100 TB dedup pass (hash-groupBy, only (hash,id) tuples shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).select("content_hash", "doc_id")


@register(
    "dedup_ngram_jaccard",
    f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
pairs AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS inter
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter / CAST(sa.set_size + sb.set_size - inter AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(inter / CAST(sa.set_size + sb.set_size - inter AS DOUBLE), 6) >= 0.5
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) via inverted-index
    self-join — candidate generation is a shingle equi-join, never O(n²)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5)


_P = 2147483647  # operators.dedup.MINHASH_PRIME


@register(
    "dedup_minhash_lsh",
    f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_P} AS h FROM sh
),
sigs AS (
  SELECT doc_id,
         {', '.join(f"min((h * {2*i+1} + {7777*i+1}) % {_P}) AS sig_{i}" for i in range(16))}
  FROM hashed GROUP BY doc_id
),
buckets AS (
  {' UNION ALL '.join(
      "SELECT doc_id, %d AS band, md5(%s) AS band_key FROM sigs"
      % (b, " || '|' || ".join(f"CAST(sig_{b*4+r} AS VARCHAR)" for r in range(4)))
      for b in range(4)
  )}
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM buckets l
JOIN buckets r ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
""",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 universal hashes over one md5 base)+LSH(4 bands) candidate
    near-dup pairs — every hash value identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4)


# SimHash oracle: the fingerprint is two md5-derived unsigned 32-bit halves
# (operators.dedup.simhash_df), so every bit vote, the assembled fingerprint,
# the prefix bucket, and the Hamming distance are reproducible in DuckDB.
_SIMHASH_SUMS = ",\n    ".join(
    [
        f"sum(CASE WHEN ((lo >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS sl{i}"
        for i in range(32)
    ]
    + [
        f"sum(CASE WHEN ((hi >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS sh{i}"
        for i in range(32)
    ]
)
_SIMHASH_FP_LO = " + ".join(
    f"(CASE WHEN sl{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)" for i in range(32)
)
_SIMHASH_FP_HI = " + ".join(
    f"(CASE WHEN sh{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)" for i in range(32)
)
_SIMHASH_HAMMING = (
    "bit_count(xor(l.fp_hi, r.fp_hi)) + bit_count(xor(l.fp_lo, r.fp_lo))"
)


@register(
    "simhash_near_dup",
    f"""
WITH toks AS (
  SELECT doc_id, md5(unnest(str_split({_NORM}, ' '))) AS m FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substr(m, 1, 8))::BIGINT AS hi,
         ('0x' || substr(m, 9, 8))::BIGINT AS lo
  FROM toks
),
sums AS (
  SELECT doc_id,
    {_SIMHASH_SUMS}
  FROM h GROUP BY doc_id
),
fp AS (
  SELECT doc_id, ({_SIMHASH_FP_HI}) AS fp_hi, ({_SIMHASH_FP_LO}) AS fp_lo FROM sums
)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       CAST({_SIMHASH_HAMMING} AS INTEGER) AS hamming
FROM fp l
JOIN fp r ON (l.fp_hi >> 16) = (r.fp_hi >> 16) AND l.doc_id < r.doc_id
WHERE {_SIMHASH_HAMMING} <= 8
""",
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit, md5-portable halves) near-dup pairs, Hamming ≤ 8,
    prefix-bucketed candidate generation — full SQL oracle (every bit vote
    reproducible in DuckDB)."""
    docs = load_table(spark, sf_dir, "documents")
    fps = dedup.simhash_df(docs)
    return dedup.simhash_near_pairs(fps, max_hamming=8).withColumn(
        "hamming", F.col("hamming").cast("int")
    )


@register(
    "token_counts",
    f"""
SELECT doc_id,
       CAST(CASE WHEN {_NORM} = '' THEN 0 ELSE len(str_split({_NORM}, ' ')) END AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '([a-z0-9]{{1,4}}|[^\\sa-z0-9])')) AS BIGINT) AS n_bpe_ish
FROM documents
""",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex word pieces."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


def _marker_hits_sql(markers: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return (
        f"len(list_filter(str_split({_NORM}, ' '), t -> list_contains({arr}, t)))"
    )


@register(
    "quality_scores",
    f"""
WITH stats AS (
  SELECT doc_id,
    CAST(CASE WHEN {_NORM} = '' THEN 0 ELSE len(str_split({_NORM}, ' ')) END AS BIGINT) AS n_tok,
    length(text) AS n_chars_raw,
    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS n_punct,
    {_marker_hits_sql(T.STOPWORDS)} AS n_stop,
    list_sum(list_transform(str_split({_NORM}, ' '), t -> length(t))) AS tok_len_sum
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tok,
    CASE WHEN n_chars_raw > 0 THEN round(n_punct / CAST(n_chars_raw AS DOUBLE), 6) ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_tok > 0 THEN round(n_stop / CAST(n_tok AS DOUBLE), 6) ELSE 0.0 END AS stopword_ratio,
    CASE WHEN n_tok > 0 THEN round(tok_len_sum / CAST(n_tok AS DOUBLE), 6) ELSE 0.0 END AS mean_token_len
  FROM stats
)
SELECT doc_id, n_tok AS token_count, punct_ratio, stopword_ratio, mean_token_len,
  round(
    least(n_tok / 50.0, 1.0) * 0.4
    + greatest(0.0, 1.0 - punct_ratio * 5) * 0.2
    + (CASE WHEN stopword_ratio >= 0.05 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.5 END) * 0.2
    + (CASE WHEN mean_token_len >= 2.5 AND mean_token_len <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.2,
  6) AS quality_score
FROM ratios
""",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword/word-length heuristics →
    composite [0,1] score (the cheap pre-filter stage of a training-data
    pipeline)."""
    docs = T.with_text_prep(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.token_count_prepped().alias("token_count"),
        T.punct_ratio(F.col("text")).alias("punct_ratio"),
        T.stopword_ratio_prepped().alias("stopword_ratio"),
        T.mean_token_len_prepped().alias("mean_token_len"),
        T.quality_score_prepped(F.col("text")).alias("quality_score"),
    )


_LANG_SCORES_SQL = ",\n    ".join(
    f"{_marker_hits_sql(m)} AS score_{lang}" for lang, m in T.LANG_MARKERS.items()
)
_BEST_SQL = "greatest(" + ", ".join(f"score_{l}" for l in T.LANG_MARKERS) + ")"
_PRED_SQL = "CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END".format(
    best=_BEST_SQL,
    whens=" ".join(
        f"WHEN score_{l} = {_BEST_SQL} THEN '{l}'" for l in sorted(T.LANG_MARKERS)
    ),
)


@register(
    "lang_id",
    f"""
WITH scored AS (SELECT doc_id, lang AS labeled_lang, {_LANG_SCORES_SQL} FROM documents)
SELECT doc_id, labeled_lang, {_PRED_SQL} AS pred_lang,
       ({_PRED_SQL}) = labeled_lang AS agrees
FROM scored
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via function-word marker hits (argmax, alphabetical
    tie-break, 'und' when nothing matches) compared to the labeled lang."""
    docs = T.with_text_prep(load_table(spark, sf_dir, "documents"))
    pred = T.lang_id_prepped()
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("agrees"),
    )


@register(
    "doc_fingerprint",
    f"""
SELECT fp AS fingerprint, count(*) AS n_docs, min(doc_id) AS first_doc
FROM (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(str_split({_NORM}, ' '))), ' ')) AS fp
  FROM documents
) GROUP BY fp
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct token set,
    grouped to expose shared-vocabulary clusters."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@register(
    "ann_cosine_topk",
    """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cvec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qvec, cvec), 6) AS cosine_sim
  FROM q JOIN c ON query_id != neighbor_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM ranked WHERE rank <= 5
""",
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors (vec_id < 10): broadcast
    queries × linear corpus scan, JVM-side zip_with/aggregate math."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5)


@register(
    "embedding_near_dup",
    """
SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
       round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 6) AS cosine_sim
FROM embeddings l
JOIN embeddings r ON l.label = r.label AND l.vec_id < r.vec_id
WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 6) >= 0.35
""",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by the label column (cluster
    id): one dense numpy matmul per block via applyInPandas
    (similarity.blocked_near_dup_numpy) — ~6x the JVM per-pair fold with
    identical rounded values. LSH-bucketed variant: ``embedding_near_dup_lsh``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.blocked_near_dup_numpy(emb, block_col="label", threshold=0.35)


@register("embedding_near_dup_lsh")  # approximate — rows-only check
def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH near-dup pairs — the 100 TB path
    (bucketed candidates instead of label blocking). Recall vs the exact
    all-pairs baseline is measured by ``embedding_lsh_recall``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.near_dup_by_cosine(emb, threshold=0.35)


@register(
    "embedding_lsh_recall",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
exact AS (
  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM e l JOIN e r ON l.vec_id < r.vec_id
  WHERE round(list_cosine_similarity(l.v, r.v), 6) >= 0.35
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok FROM exact
""",
)
def q_embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall harness: EXACT all-pairs cosine ≥ 0.35 (O(n²) ground truth
    — the embeddings table is model-sized at every SF) vs the multi-table
    LSH pairs, in one job. Emits the exact-pair count (oracle-verified: the
    DuckDB side recomputes the full exact self-join) and ``recall_ok`` =
    recall ≥ 0.9 (oracle expects TRUE — a below-contract LSH recall fails the
    driver's hash check). Expected recall of the 2-bit × 8-table config at
    cosine 0.35 is ≈ 0.97 (sign-agreement p ≈ 0.61); measured ≈ 0.95+ on the
    driver corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity.all_pairs_cosine(emb, threshold=0.35).select("vec_a", "vec_b")
    approx = similarity.near_dup_by_cosine(emb, threshold=0.35).select(
        "vec_a", "vec_b"
    )
    flagged = exact.join(
        approx.withColumn("hit", F.lit(1)), ["vec_a", "vec_b"], "left"
    )
    return flagged.agg(
        F.count("*").alias("n_exact_pairs"),
        F.coalesce(
            (F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count("*")) >= 0.9,
            F.lit(True),  # empty exact set → vacuously in contract
        ).alias("recall_ok"),
    )


@register(
    "sessionize_events",
    """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
FROM sessions
GROUP BY user_id, session_id
""",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the standard telemetry operator the reference's event stream would need
    at dashboard scale. One shuffle on user_id serves both windows and the
    final rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared at µs precision — matches the oracle's exact INTERVAL math
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_sec"
        ),
    )


@register(
    "rollup_grouping_sets",
    """
WITH normalized AS (
  SELECT CASE event_type WHEN 'purchase' THEN 'CALLS' WHEN 'signup' THEN 'TEXTS'
         ELSE 'OTHER' END AS MetricID,
         CAST(user_id AS VARCHAR) AS AgentID
  FROM events WHERE event_type IN ('purchase', 'signup')
)
SELECT AgentID, MetricID, count(*) AS EventCount,
       CAST(grouping(AgentID) AS BIGINT) AS g_agent,
       CAST(grouping(MetricID) AS BIGINT) AS g_metric
FROM normalized
GROUP BY GROUPING SETS ((AgentID, MetricID), (MetricID), ())
""",
)
def q_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level rollup in one pass via GROUPING SETS — (agent, metric),
    per-metric totals, and the grand total share a single shuffle (extension
    surface beyond the reference's per-day DAX rollups)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        WITH normalized AS (
          SELECT CASE event_type WHEN 'purchase' THEN 'CALLS' WHEN 'signup' THEN 'TEXTS'
                 ELSE 'OTHER' END AS MetricID,
                 CAST(user_id AS STRING) AS AgentID
          FROM events_gs WHERE event_type IN ('purchase', 'signup')
        )
        SELECT AgentID, MetricID, count(*) AS EventCount,
               CAST(grouping(AgentID) AS BIGINT) AS g_agent,
               CAST(grouping(MetricID) AS BIGINT) AS g_metric
        FROM normalized
        GROUP BY GROUPING SETS ((AgentID, MetricID), (MetricID), ())
        """
    )


@register(
    "multimodal_features",
    """
SELECT doc_id AS asset_id,
       ['image','audio','video'][(doc_id % 3) + 1] AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS content_sha256,
       round(list_sum(list_transform(range(8),
             i -> ('0x' || substr(sha256(text), 2*i+1, 2))::BIGINT / 255.0)) / 8.0, 6) AS feat_mean,
       8 AS feat_dim,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                 ELSE greatest(1, octet_length(encode(text)) // 64) END AS INTEGER) AS frames_sampled
FROM documents
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column pipeline: documents → binary asset columns →
    mapInPandas decode/feature extraction (stubbed codecs, deterministic fake
    decoder — functions/multimodal.py). The sha256-derived features are
    mirrored exactly by the SQL oracle, proving the Arrow-batch plumbing
    end-to-end."""
    from ..functions.multimodal import extract_features, synthesize_assets_from_documents

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_assets_from_documents(docs))
    return feats.withColumn("feat_mean", F.round(F.col("feat_mean") / 1.0, 6)).select(
        "asset_id",
        "modality",
        "byte_len",
        "content_sha256",
        "feat_mean",
        F.col("feat_dim").cast("int").alias("feat_dim"),
        "frames_sampled",
    )


@register("multimodal_real_decode")  # stdlib codec output — rows-only check
def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal REAL-decode pipeline: synthesize genuine codec payloads
    per document (mapInPandas, executor-side) and decode them with the
    in-repo codecs behind decode_asset — PCM RMS features for audio, RGB
    channel means for images. The stripe set spans the decoders' profile
    surface: WAV, BMP, PPM, five-filter PNG, baseline 4:4:4 JPEG, plus
    (r12) 4:2:0-with-restart-markers and progressive SOF2 JPEG and
    palette / Adam7-interlaced / 16-bit PNG — so the driver-checked query
    exercises every entropy/layout lane the profile tests pin in
    isolation. The decode math is not SQL-expressible, so this registers
    rows-only; exact feature values are locked by
    tests/test_multimodal_codecs.py golden vectors against a pure-Python
    reference."""
    from ..functions.multimodal import (
        extract_features,
        synthesize_codec_assets_from_documents,
    )
    from ..sources.readers import ensure_min_partitions

    # The codec work (Python entropy decode on the JPEG stripes) is the
    # CPU-heavy projection ensure_min_partitions exists for: single-file
    # driver testdata scans as ONE task, serializing the whole decode.
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    assets = synthesize_codec_assets_from_documents(docs)
    return extract_features(assets, use_real_decoder=True).select(
        "asset_id",
        "modality",
        "byte_len",
        "content_sha256",
        F.round(F.col("feat_mean"), 6).alias("feat_mean"),
        F.col("feat_dim").cast("int").alias("feat_dim"),
        "frames_sampled",
    )


@register("ann_ivf_topk")  # approximate — rows-only check
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: nprobe=1 cell probe with the first 8 vectors as fixed
    coarse centroids — the scan-reduction scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, centroids, k=5)


@register(
    "ann_cosine_topk_vectorized",
    """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cvec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qvec, cvec), 6) AS cosine_sim
  FROM q JOIN c ON query_id != neighbor_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM ranked WHERE rank <= 5
""",
)
def q_ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy fast lane for exact cosine top-k: broadcast query matrix,
    per-batch (B×D)·(D×Q) matmul, per-partition local top-k (functions/
    vectors.py). Same semantics/oracle as ann_cosine_topk — the BLAS path for
    high-dim or many-query workloads."""
    from ..functions.vectors import topk_vs_query_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    query_rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .collect()
    ]
    return topk_vs_query_matrix(emb, query_rows, k=5)


@register("ann_ivf_trained_topk")  # approximate (learned index) — rows-only
def q_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF top-k: k-means centroids (3 distributed Lloyd's
    iterations), nprobe=2 — the iterative-algorithm + learned-index ANN path
    (operators/similarity.py ivf_topk_trained)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk_trained(emb, queries, n_cells=8, n_probe=2, iters=3, k=5)


@register(
    "ann_ivf_recall",
    """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cvec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qvec, cvec), 6) AS cosine_sim
  FROM q JOIN c ON query_id != neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id,
       md5(array_to_string(list_sort(list(neighbor_id)), ',')) AS exact_topk_hash,
       TRUE AS recall_ok
FROM ranked WHERE rank <= 5
GROUP BY query_id
""",
)
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall harness: exact brute-force top-5 and trained-IVF
    (8 cells, nprobe=4) top-5 in one job, per query vector. Emits the md5 of
    the sorted exact neighbor-id list (oracle-verified — DuckDB recomputes
    the exact top-5 and the same hash) and ``recall_ok`` = per-query recall
    ≥ 0.7 (oracle expects TRUE; measured min 0.8 / avg ≥ 0.94 at sf0.001 and
    sf0.01, so a genuine recall regression in the IVF path flips the row and
    fails the driver's hash check)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.ivf_topk_trained(
        emb, queries, n_cells=8, n_probe=4, iters=3, k=5
    ).select("query_id", F.col("neighbor_id").alias("approx_neighbor_id"))
    flagged = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["approx_neighbor_id"]),
        "left",
    ).select(
        exact["query_id"],
        exact["neighbor_id"],
        F.when(approx["approx_neighbor_id"].isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return flagged.groupBy("query_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("neighbor_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("exact_topk_hash"),
        ((F.sum("hit") / F.count("*")) >= 0.7).alias("recall_ok"),
    )


# --------------------------------------------------------------------------- #
# Duplicate-cluster resolution + deterministic sampling (operators/clustering)
# --------------------------------------------------------------------------- #

# Jaccard near-dup PAIRS as reusable CTEs (same semantics as the
# dedup_ngram_jaccard oracle above; threshold 0.5).
_JPAIRS_CTES = f"""
{_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
cand AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS inter
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE round(inter / CAST(sa.set_size + sb.set_size - inter AS DOUBLE), 6) >= 0.5
)
""".strip()

# Transitive closure of the pair graph; min reachable id = cluster id.
_CLUSTER_CTES = f"""
{_JPAIRS_CTES},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jpairs
  UNION
  SELECT doc_b, doc_a FROM jpairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, rr.r FROM edges e JOIN reach rr ON rr.node = e.b
),
comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY node),
clustered AS (
  SELECT d.doc_id, d.n_chars, coalesce(c.cid, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
""".strip()


def _jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return clustering.attach_clusters(
        docs, clustering.connected_components(pairs)
    )


@register(
    "dup_clusters",
    f"""
WITH RECURSIVE {_CLUSTER_CTES}
SELECT doc_id, cluster_id FROM clustered
""",
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group assignment: connected components over exact Jaccard
    near-dup pairs (iterative min-label propagation, operators/clustering.py);
    singletons keep their own id. Oracle = recursive-CTE transitive closure."""
    return _jaccard_clusters(spark, sf_dir).select("doc_id", "cluster_id")


@register(
    "dedup_survivors",
    f"""
WITH RECURSIVE {_CLUSTER_CTES},
ranked AS (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS csize
  FROM clustered
)
SELECT cluster_id, doc_id, n_chars, CAST(csize AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1
""",
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor pick: ONE doc per duplicate cluster (longest text,
    ties to lowest id) + cluster size — the final 'emit deduped corpus' stage
    of the near-dup pipeline."""
    return clustering.canonical_survivors(_jaccard_clusters(spark, sf_dir)).select(
        "cluster_id", "doc_id", "n_chars", "cluster_size"
    )


_SAMPLE_BUCKET_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "stratified_sample",
    f"""
SELECT doc_id, lang, source FROM documents
WHERE {_SAMPLE_BUCKET_SQL} % 100 <
      CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 WHEN 'zh' THEN 40 ELSE 25 END
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language corpus sampling (training-data mixing):
    md5-hash bucketing, reproducible across engines/runs/partitionings —
    no RNG, no shuffle, filter evaluated inside the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    return clustering.stratified_sample(
        docs, "doc_id", "lang", {"en": 80, "de": 50, "zh": 40}, default_pct=25
    ).select("doc_id", "lang", "source")


@register(
    "corpus_shards",
    f"""
SELECT {_SAMPLE_BUCKET_SQL} % 16 AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY shard
""",
)
def q_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding: hash-assign docs to 16 shards and audit
    per-shard row/char balance — the layout step before a partitioned write
    (`df.repartition(N, shard).write`); hash sharding keeps shards balanced
    regardless of source/date skew."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        clustering.hash_bucket(F.col("doc_id"), 16).alias("shard")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# Ratio CTE shared with the quality_scores oracle above, reused for gating.
_QRATIOS_CTES = f"""
stats AS (
  SELECT doc_id,
    CAST(CASE WHEN {_NORM} = '' THEN 0 ELSE len(str_split({_NORM}, ' ')) END AS BIGINT) AS n_tok,
    length(text) AS n_chars_raw,
    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS n_punct,
    __STOP_HITS__ AS n_stop,
    list_sum(list_transform(str_split({_NORM}, ' '), t -> length(t))) AS tok_len_sum
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tok,
    CASE WHEN n_chars_raw > 0 THEN round(n_punct / CAST(n_chars_raw AS DOUBLE), 6) ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_tok > 0 THEN round(n_stop / CAST(n_tok AS DOUBLE), 6) ELSE 0.0 END AS stopword_ratio,
    CASE WHEN n_tok > 0 THEN round(tok_len_sum / CAST(n_tok AS DOUBLE), 6) ELSE 0.0 END AS mean_token_len
  FROM stats
)
""".strip()


@register(
    "quality_filter",
    f"""
WITH {_QRATIOS_CTES.replace("__STOP_HITS__", _marker_hits_sql(T.STOPWORDS))},
gated AS (
  SELECT doc_id,
    n_tok < 20 AS too_short,
    punct_ratio > 0.2 AS too_much_punct,
    NOT (stopword_ratio >= 0.05 AND stopword_ratio <= 0.6) AS stopword_band,
    NOT (mean_token_len >= 2.5 AND mean_token_len <= 10.0) AS token_len_band
  FROM ratios
)
SELECT doc_id,
  NOT (too_short OR too_much_punct OR stopword_band OR token_len_band) AS keep,
  concat_ws(',',
    CASE WHEN too_short THEN 'too_short' END,
    CASE WHEN too_much_punct THEN 'too_much_punct' END,
    CASE WHEN stopword_band THEN 'stopword_band' END,
    CASE WHEN token_len_band THEN 'token_len_band' END) AS drop_reasons
FROM gated
""",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style gated quality filter: per-doc keep/drop decision with the
    failed-gate names — the auditable form of corpus filtering (at 100 TB you
    keep the decision + reasons, not just the surviving rows, so filter-rate
    drift per source/date is monitorable)."""
    docs = T.with_text_prep(load_table(spark, sf_dir, "documents"))
    # Gate definitions come from the single shared source of truth — the
    # same dict the streaming drift monitor folds into its keep-rate.
    gates = T.quality_gates_prepped()
    gated = docs.select(
        "doc_id", *[gate.alias(name) for name, gate in gates.items()]
    )
    return gated.select(
        "doc_id",
        (
            ~(
                F.col("too_short")
                | F.col("too_much_punct")
                | F.col("stopword_band")
                | F.col("token_len_band")
            )
        ).alias("keep"),
        F.concat_ws(
            ",",
            F.when(F.col("too_short"), F.lit("too_short")),
            F.when(F.col("too_much_punct"), F.lit("too_much_punct")),
            F.when(F.col("stopword_band"), F.lit("stopword_band")),
            F.when(F.col("token_len_band"), F.lit("token_len_band")),
        ).alias("drop_reasons"),
    )


@register(
    "corpus_pipeline_full",
    f"""
WITH RECURSIVE {_CLUSTER_CTES},
ranked AS (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS csize
  FROM clustered
),
survivors AS (
  SELECT cluster_id, doc_id, CAST(csize AS BIGINT) AS cluster_size
  FROM ranked WHERE rn = 1
),
{{_QR}},
gated AS (
  SELECT doc_id,
    NOT (n_tok < 20
         OR punct_ratio > 0.2
         OR NOT (stopword_ratio >= 0.05 AND stopword_ratio <= 0.6)
         OR NOT (mean_token_len >= 2.5 AND mean_token_len <= 10.0)) AS keep
  FROM ratios
)
SELECT s.doc_id, d.lang, d.source, s.cluster_size,
       {_SAMPLE_BUCKET_SQL.replace("doc_id", "s.doc_id")} % 16 AS shard
FROM survivors s
JOIN documents d ON s.doc_id = d.doc_id
JOIN gated g ON s.doc_id = g.doc_id
WHERE g.keep
  AND {_SAMPLE_BUCKET_SQL.replace("doc_id", "s.doc_id")} % 100 <
      CASE d.lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 WHEN 'zh' THEN 40 ELSE 25 END
""".replace("{_QR}", _QRATIOS_CTES.replace("__STOP_HITS__", _marker_hits_sql(T.STOPWORDS))),
)
def q_corpus_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star flagship: the WHOLE training-data prep pipeline as one
    DataFrame graph — near-dup pairs (PPJoin Jaccard) → connected-components
    duplicate clusters → canonical survivor per cluster → Gopher-style
    quality gate → deterministic per-language stratified sample → output
    shard assignment. The training-data analog of ingest_pipeline_full, and
    every stage is the SAME operator its standalone query uses, so the full
    composition is verified end-to-end against one DuckDB oracle (recursive-
    CTE closure + ratio CTEs + md5 sample buckets). Plan shape: the pair
    generation and per-round CC joins are the only wide stages; the gate,
    sample, and shard assignment are row-local over the (small) survivor
    set."""
    docs = load_table(spark, sf_dir, "documents")
    clustered = _jaccard_clusters(spark, sf_dir)
    survivors = clustering.canonical_survivors(clustered).select(
        "doc_id", "cluster_size"
    )
    # r15 (guide §8 "decide with small rows"): evaluate the quality gate on
    # the survivor rows only, AFTER the join — the gate is row-local on text
    # and inner joins commute with row-local filters, so this is
    # row-identical to gating the whole corpus first (the oracle's shape),
    # while the tokenize/regex/marker expressions run over |survivors| rows
    # instead of the full corpus.
    enriched = (
        T.with_text_prep(
            survivors.join(
                docs.select("doc_id", "lang", "source", "text"), "doc_id"
            )
        )
        .filter(T.quality_keep_prepped())
        .select("doc_id", "lang", "source", "cluster_size")
    )
    sampled = clustering.stratified_sample(
        enriched, "doc_id", "lang", {"en": 80, "de": 50, "zh": 40}, default_pct=25
    )
    return sampled.select(
        "doc_id",
        "lang",
        "source",
        "cluster_size",
        clustering.hash_bucket(F.col("doc_id"), 16).alias("shard"),
    )


@register(
    "semantic_dup_clusters",
    """
WITH RECURSIVE epairs AS (
  SELECT l.vec_id AS a, r.vec_id AS b
  FROM embeddings l
  JOIN embeddings r ON l.label = r.label AND l.vec_id < r.vec_id
  WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 6) >= 0.35
),
edges AS (
  SELECT a, b FROM epairs
  UNION
  SELECT b, a FROM epairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, rr.r FROM edges e JOIN reach rr ON rr.node = e.b
),
comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY node)
SELECT em.vec_id, coalesce(c.cid, em.vec_id) AS cluster_id
FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.node
""",
)
def q_semantic_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup-shaped): duplicate groups = connected
    components over embedding-cosine near-dup pairs — same clustering
    operator as the lexical path, different pair emitter; singleton vectors
    keep their own id."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.blocked_near_dup_numpy(
        emb, block_col="label", threshold=0.35
    ).select("vec_a", "vec_b")
    comp = clustering.connected_components(pairs, src="vec_a", dst="vec_b")
    return clustering.attach_clusters(emb, comp, id_col="vec_id").select(
        "vec_id", "cluster_id"
    )


@register(
    "repetition_stats",
    f"""
WITH toks AS (SELECT doc_id, str_split({_NORM}, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_transform(
           range(greatest(len(t) - 1, 0)), i -> t[i+1] || ' ' || t[i+2]
         )) AS gram
  FROM toks
),
per AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
stats AS (
  SELECT doc_id, sum(c) AS total, count(*) AS nd, max(c) AS top
  FROM per GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.total, 0) AS BIGINT) AS total_2grams,
       round(CASE WHEN s.total > 0
                  THEN 1 - s.nd / CAST(s.total AS DOUBLE) ELSE 0.0 END, 6)
         AS dup_2gram_frac,
       round(CASE WHEN s.total > 0
                  THEN s.top / CAST(s.total AS DOUBLE) ELSE 0.0 END, 6)
         AS top_2gram_coverage
FROM documents d LEFT JOIN stats s ON d.doc_id = s.doc_id
""",
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filters (Gopher-style): duplicate-2-gram
    fraction and most-frequent-2-gram coverage per doc. Shape is explode →
    two-level groupBy — scale-safe for arbitrarily long documents (a per-row
    array-fold would be O(len²) on monster docs); only (doc_id, gram-hash)
    tuples shuffle."""
    from ..sources.readers import ensure_min_partitions

    docs = load_table(spark, sf_dir, "documents")
    grams = ensure_min_partitions(docs).select(
        "doc_id",
        F.explode(
            dedup.shingles(F.col("text"), n=2, distinct=False)
        ).alias("gram"),
    )
    per = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    stats = per.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("nd"),
        F.max("c").alias("top"),
    )
    return docs.join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("total"), F.lit(0)).alias("total_2grams"),
        F.round(
            F.when(
                F.col("total") > 0, 1 - F.col("nd") / F.col("total")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_2gram_frac"),
        F.round(
            F.when(
                F.col("total") > 0, F.col("top") / F.col("total")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_2gram_coverage"),
    )


# --------------------------------------------------------------------------- #
# Corpus assembly: decontamination + sequence packing (operators/corpus.py)
# --------------------------------------------------------------------------- #

from ..operators import corpus as corpus_ops  # noqa: E402


@register(
    "decontamination_flags",
    f"""
WITH {_SHINGLES_CTE},
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
overlap AS (
  SELECT s.doc_id, count(*) AS n_overlap
  FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
  WHERE s.doc_id % 50 != 0
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(o.n_overlap, 0) >= 5 AS contaminated
FROM documents d LEFT JOIN overlap o ON d.doc_id = o.doc_id
WHERE d.doc_id % 50 != 0
""",
)
def q_decontamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥5 distinct
    3-gram shingles with the held-out eval slice (doc_id % 50 == 0 stands in
    for a benchmark suite). Eval shingle set broadcasts; the corpus never
    shuffles whole."""
    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return corpus_ops.decontamination_flags(corpus, eval_set, min_overlap=5)


@register(
    "sequence_packing",
    f"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
         CAST(CASE WHEN {_NORM} = '' THEN 0 ELSE len(str_split({_NORM}, ' ')) END AS BIGINT) AS n_tokens
  FROM documents
),
laid AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM toks
)
SELECT doc_id, shard, n_tokens, start_offset,
       CAST(floor(start_offset / 512) AS BIGINT) AS pack_id,
       CASE WHEN n_tokens > 0
            THEN floor((start_offset + n_tokens - 1) / 512) != floor(start_offset / 512)
            ELSE FALSE END AS straddles
FROM laid
""",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-split, context 512): deterministic token
    layout per hash shard — each doc's start offset, context-window id, and
    boundary-straddle flag from one cumulative-sum window."""
    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id",
        clustering.hash_bucket(F.col("doc_id"), 8).alias("shard"),
        T.token_count(F.col("text")).alias("n_tokens"),
    )
    return corpus_ops.pack_sequences(
        with_tok, shard_col="shard", order_col="doc_id",
        token_col="n_tokens", context_len=512,
    )


from .registry import ORACLES as _ORACLES  # noqa: E402


@register(
    "quality_drift_by_source",
    f"""
WITH q AS ({_ORACLES['quality_filter']})
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN q.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(avg(CASE WHEN q.keep THEN 1.0 ELSE 0.0 END), 6) AS keep_rate
FROM documents d JOIN q ON d.doc_id = q.doc_id
GROUP BY d.source
""",
)
def q_quality_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch counterpart of the streaming quality-drift monitor
    (streaming/pipeline.streaming_quality_drift): per-source keep-rate of the
    FULL quality gate — the number an operator alerts on when one crawl
    source starts shipping garbage. Reuses quality_filter's gate verdicts
    (and its oracle as a CTE), so the monitored rate is exactly the rate the
    corpus pipeline enforces. One shuffle on source; boolean aggregation
    only — document text never moves."""
    docs = load_table(spark, sf_dir, "documents")
    verdicts = q_quality_filter(spark, sf_dir).select("doc_id", "keep")
    return (
        docs.select("doc_id", "source")
        .join(verdicts, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.avg(F.col("keep").cast("double")), 6).alias("keep_rate"),
        )
    )


@register(
    "corpus_stats_by_source",
    f"""
WITH q AS ({_ORACLES['quality_scores']})
SELECT d.source, d.lang,
       count(*) AS n_docs,
       CAST(sum(q.token_count) AS BIGINT) AS total_tokens,
       round(avg(q.quality_score), 6) AS avg_quality
FROM documents d JOIN q ON d.doc_id = q.doc_id
GROUP BY d.source, d.lang
""",
)
def q_corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus audit: doc count, token volume, mean quality
    — the aggregate a mixing policy (stratified_sample rates) is tuned from.
    One shuffle on (source, lang) with map-side partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    q = q_quality_scores(spark, sf_dir)
    return (
        docs.select("doc_id", "source", "lang")
        .join(q, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        )
    )
