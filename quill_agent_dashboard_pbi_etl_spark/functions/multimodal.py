"""Multimodal column support (north-star ops, BASELINE.json).

Pattern: image/audio/video payloads are opaque ``binary`` columns riding next
to typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over ``mapInPandas`` so the Python cost is paid
per-batch, not per-row, and each partition streams through without
materializing.

The actual codec work is STUBBED (this container ships no image/audio libs):
``decode_asset`` raises ``NotImplementedError`` and the pipeline uses
``fake_decode`` — a deterministic, dependency-free stand-in that produces the
same shapes a real decoder would. The Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the decode/feature stage.
ASSET_FEATURES_SCHEMA = (
    "asset_id long, modality string, byte_len long, content_sha256 string, "
    "feat_mean double, feat_dim int, frames_sampled int"
)


def decode_asset(payload: bytes, modality: str):  # pragma: no cover - stub
    """Real decoder hook (PIL/torchaudio/pyav in production images).

    Deliberately unimplemented here: the container has no codec libraries.
    """
    raise NotImplementedError(
        "codec libraries unavailable in this environment; use fake_decode"
    )


def fake_decode(payload: bytes, modality: str) -> tuple[list[float], int]:
    """Deterministic stand-in decoder: derives a tiny 'feature vector' from
    the payload's sha256 and a 'frame count' from its length — stable across
    runs/engines, exercising the exact data shapes of a real decoder."""
    digest = hashlib.sha256(payload).digest()
    feats = [b / 255.0 for b in digest[:8]]
    frames = 1 if modality == "image" else max(1, len(payload) // 64)
    return feats, frames


def extract_features(assets: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode + featurize each asset via mapInPandas (Arrow batches).

    Input schema: (asset_id long, modality string, content binary, ...).
    One Python worker pass per partition; the batch loop is vectorized where
    possible and the output is a narrow features table, so the wide binary
    column never shuffles.
    """
    decoder = decode_asset if use_real_decoder else fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                payload = bytes(content) if content is not None else b""
                feats, frames = decoder(payload, modality)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "modality": modality,
                        "byte_len": len(payload),
                        "content_sha256": hashlib.sha256(payload).hexdigest(),
                        "feat_mean": float(sum(feats) / len(feats)) if feats else 0.0,
                        "feat_dim": len(feats),
                        "frames_sampled": frames,
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(process, ASSET_FEATURES_SCHEMA)


def synthesize_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents table for testing:
    text bytes stand in for binary payloads, modality assigned round-robin.
    (Real pipelines land binaries from object storage with parquet pointers.)
    """
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
    )


# Output schema of the resize stage: binary out, new dims alongside.
RESIZED_ASSET_SCHEMA = (
    "asset_id long, modality string, content binary, width int, height int, "
    "byte_len long"
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize (PIL.Image.resize in
    production): re-derives a payload of size proportional to the target
    area from the source bytes — stable, shape-correct, no codecs."""
    if not payload:
        return b""
    target_len = max(1, (width * height) // 64)
    reps = target_len // len(payload) + 1
    return (payload * reps)[:target_len]


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize every image asset via mapInPandas; non-image rows pass through
    untouched. Binary in → binary out: the stage composes with further
    asset transforms without leaving Arrow."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                payload = bytes(content) if content is not None else b""
                if modality == "image":
                    payload = fake_resize(payload, width, height)
                out.append(
                    {
                        "asset_id": asset_id,
                        "modality": modality,
                        "content": payload,
                        "width": width if modality == "image" else 0,
                        "height": height if modality == "image" else 0,
                        "byte_len": len(payload),
                    }
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(process, RESIZED_ASSET_SCHEMA)


# One row per sampled frame — the explode-shaped stage.
FRAME_SAMPLE_SCHEMA = (
    "asset_id long, frame_index int, frame_sha256 string, frame_bytes long"
)


def sample_frames(assets: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Sample every Nth 'frame' of video/audio assets via mapInPandas
    (pyav/ffmpeg keyframe extraction in production; here each 64-byte payload
    slice stands in for a frame). Emits one row per sampled frame — the
    1→many shape a real frame sampler has, so downstream per-frame feature
    extraction parallelizes over frames, not videos."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                if modality not in ("video", "audio") or content is None:
                    continue
                payload = bytes(content)
                n_frames = max(1, len(payload) // 64)
                for j, idx in enumerate(range(0, n_frames, every_n)):
                    if j >= max_frames:
                        break
                    frame = payload[idx * 64 : (idx + 1) * 64]
                    out.append(
                        {
                            "asset_id": asset_id,
                            "frame_index": idx,
                            "frame_sha256": hashlib.sha256(frame).hexdigest(),
                            "frame_bytes": len(frame),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["asset_id", "frame_index", "frame_sha256", "frame_bytes"]
            )

    return assets.mapInPandas(process, FRAME_SAMPLE_SCHEMA)
