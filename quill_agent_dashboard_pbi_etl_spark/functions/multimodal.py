"""Multimodal column support (north-star ops, BASELINE.json).

Pattern: image/audio/video payloads are opaque ``binary`` columns riding next
to typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over ``mapInPandas`` so the Python cost is paid
per-batch, not per-row, and each partition streams through without
materializing.

Codec support is two-tier. ``decode_asset`` REALLY decodes the formats the
Python stdlib can parse — PCM WAV (``wave``), uncompressed 24-bit BMP,
binary PPM (``struct``), and non-interlaced 8-bit RGB/RGBA PNG (``zlib``
inflate + full None/Sub/Up/Average/Paeth unfiltering) — and raises
``NotImplementedError`` for formats needing external codecs (JPEG/MP4 need
PIL/pyav, absent in this container) or PNG features beyond that profile
(palette, 16-bit, interlace); that raise is the production-decoder hook.
``fake_decode`` remains the dependency-free stand-in for pipelines over
arbitrary payloads. The Spark-side plumbing (schemas, Arrow batch iteration,
partitioning) is identical for both and tested end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from array import array
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the decode/feature stage.
ASSET_FEATURES_SCHEMA = (
    "asset_id long, modality string, byte_len long, content_sha256 string, "
    "feat_mean double, feat_dim int, frames_sampled int"
)


def _decode_wav(payload: bytes) -> tuple[list[float], int]:
    """PCM WAV → (8-segment normalized RMS vector, PCM frame count)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width == 2:
        samples = array("h", raw)
        full_scale = 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = array("b", bytes((b - 128) & 0xFF for b in raw))
        full_scale = 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    if not samples:
        return [0.0] * 8, 0
    seg = max(1, len(samples) // 8)
    feats = []
    for i in range(8):
        chunk = samples[i * seg : (i + 1) * seg] or samples[-seg:]
        rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
        feats.append(rms / full_scale)
    return feats, n_frames


def _mean_rgb(pixels_rgb: Iterator[tuple[int, int, int]], count: int) -> list[float]:
    sums = [0, 0, 0]
    for r, g, b in pixels_rgb:
        sums[0] += r
        sums[1] += g
        sums[2] += b
    return [s / count / 255.0 for s in sums] if count else [0.0, 0.0, 0.0]


def _decode_bmp(payload: bytes) -> tuple[list[float], int]:
    """Uncompressed 24-bit BI_RGB BMP → ([mean_r, mean_g, mean_b], 1)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    row_stride = (width * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries

    def pixels():
        for row in range(abs(height)):
            base = data_offset + row * row_stride
            for col in range(width):
                off = base + col * 3
                b, g, r = payload[off], payload[off + 1], payload[off + 2]
                yield r, g, b

    return _mean_rgb(pixels(), width * abs(height)), 1


def _decode_ppm(payload: bytes) -> tuple[list[float], int]:
    """Binary PPM (P6, maxval 255) → ([mean_r, mean_g, mean_b], 1)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single-ws> raster
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval={maxval}")
    raster = payload[pos + 1 : pos + 1 + width * height * 3]
    trip = struct.iter_unpack("BBB", raster)
    return _mean_rgb(trip, width * height), 1


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes) -> tuple[list[float], int]:
    """Non-interlaced 8-bit truecolor PNG (color type 2 RGB / 6 RGBA) →
    ([mean_r, mean_g, mean_b], 1), stdlib-only.

    A real decoder, not a sniffer: chunk CRCs are verified (zlib.crc32),
    IDAT fragments are concatenated and inflated as one zlib stream, and
    every scanline filter the spec defines (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) is unfiltered byte-exactly. Alpha is parsed but excluded
    from the channel means so RGB and RGBA containers of the same pixels
    featurize identically (matching the BMP/PPM contract). Palette, 16-bit,
    grayscale, and interlaced PNGs raise ``NotImplementedError`` — the same
    plug-in hook as JPEG/MP4. Unfiltering is sequential per byte because
    Sub/Average/Paeth predict from the *decoded* left neighbor; payloads in
    this pipeline are asset-sized (not gigapixel), and the loop runs
    executor-side inside mapInPandas."""
    if payload[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
            bit_depth, color_type, _comp, _filt, interlace = data[8:13]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG profile beyond stdlib decoder (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); plug PIL into "
            "decode_asset"
        )
    channels = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    sums = [0, 0, 0]
    prev = bytearray(stride)
    rpos = 0
    for _row in range(height):
        f = raw[rpos]
        line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += stride + 1
        if f == 0:  # None
            pass
        elif f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        for x in range(0, stride, channels):
            sums[0] += line[x]
            sums[1] += line[x + 1]
            sums[2] += line[x + 2]
        prev = line
    count = width * height
    return ([s / count / 255.0 for s in sums] if count else [0.0] * 3), 1


def decode_asset(payload: bytes, modality: str) -> tuple[list[float], int]:
    """Real decoder: magic-sniffs the stdlib-decodable formats and extracts
    (feature_vector, frame_count). Compressed formats raise
    ``NotImplementedError`` — the hook where PIL/torchaudio/pyav plug in on a
    production image."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:8] == _PNG_SIGNATURE:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        f"no stdlib codec for this {modality} payload "
        f"(magic={payload[:4]!r}); plug PIL/torchaudio/pyav into decode_asset"
    )


def _lcg_bytes(seed: int, n: int) -> bytes:
    """Deterministic pseudo-random bytes (LCG) — engine-portable test data."""
    x = (seed * 2654435761 + 1) & 0xFFFFFFFF
    out = bytearray(n)
    for i in range(n):
        x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        out[i] = (x >> 16) & 0xFF
    return bytes(out)


def make_wav_bytes(seed: int, n_frames: int = 256, framerate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV payload for the real-decode path."""
    raw = _lcg_bytes(seed, n_frames * 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(raw)
    return buf.getvalue()


def make_bmp_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic uncompressed 24-bit BMP payload."""
    row_stride = (width * 3 + 3) // 4 * 4
    raster_size = row_stride * height
    # Interpret the LCG stream as RGB triples (same as make_ppm_bytes) and
    # write them in BMP's BGR raster order, so the two containers hold the
    # same logical pixels for a given seed.
    pix = _lcg_bytes(seed, width * height * 3)
    raster = bytearray(raster_size)
    k = 0
    for row in range(height):
        base = row * row_stride
        for col in range(width):
            r, g, b = pix[k], pix[k + 1], pix[k + 2]
            off = base + col * 3
            raster[off], raster[off + 1], raster[off + 2] = b, g, r
            k += 3
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + raster_size, 0, 0, 54,  # file header: size, reserved, data offset
        40, width, height, 1, 24, 0, raster_size, 2835, 2835, 0, 0,  # BITMAPINFOHEADER
    )
    return header + bytes(raster)


def make_ppm_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic binary PPM (P6) payload."""
    return b"P6\n%d %d\n255\n" % (width, height) + _lcg_bytes(seed, width * height * 3)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png_bytes(
    seed: int, width: int = 8, height: int = 8, rgba: bool = False
) -> bytes:
    """Deterministic non-interlaced 8-bit PNG payload holding the SAME
    logical RGB pixels as ``make_ppm_bytes``/``make_bmp_bytes`` for a given
    seed (``rgba=True`` adds an opaque alpha channel), so cross-container
    feature equality pins the whole zlib + unfilter path. Scanline filters
    cycle 0→4 by row — every filter type the spec defines is exercised on
    any image ≥5 rows, making the synthesizer a genuine encoder, not a
    filter-0-only shortcut."""
    channels = 4 if rgba else 3
    pix = _lcg_bytes(seed, width * height * 3)
    rows: list[bytes] = []
    k = 0
    for _r in range(height):
        line = bytearray()
        for _c in range(width):
            line += pix[k : k + 3]
            if rgba:
                line.append(255)
            k += 3
        rows.append(bytes(line))
    stride = width * channels
    prev = bytes(stride)
    filtered = bytearray()
    for r, line in enumerate(rows):
        f = r % 5
        filtered.append(f)
        for i in range(stride):
            x = line[i]
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x - pred
            filtered.append(v & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6 if rgba else 2, 0, 0, 0)
    return (
        _PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + _png_chunk(b"IEND", b"")
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


def synthesize_codec_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table whose payloads are REAL codec bytes
    (WAV / BMP / PPM / PNG, seeded by doc_id) so ``extract_features(...,
    use_real_decoder=True)`` exercises actual decoding — including zlib
    inflate + scanline unfiltering on the PNG rows. Generation runs in
    mapInPandas — payloads are born on executors, never on the driver."""
    out_schema = "asset_id long, modality string, content binary, mime_type string"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = [
            ("audio", "audio/wav", make_wav_bytes),
            ("image", "image/bmp", make_bmp_bytes),
            ("image", "image/x-portable-pixmap", make_ppm_bytes),
            ("image", "image/png", make_png_bytes),
        ]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                modality, mime, maker = makers[int(doc_id) % len(makers)]
                rows.append(
                    {
                        "asset_id": int(doc_id),
                        "modality": modality,
                        "content": maker(int(doc_id)),
                        "mime_type": mime,
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "modality", "content", "mime_type"])

    return docs.select("doc_id").mapInPandas(synth, out_schema)


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
