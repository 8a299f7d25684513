"""Multimodal column support (north-star ops, BASELINE.json).

Pattern: image/audio/video payloads are opaque ``binary`` columns riding next
to typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over ``mapInPandas`` so the Python cost is paid
per-batch, not per-row, and each partition streams through without
materializing.

Codec support is two-tier. ``decode_asset`` REALLY decodes the formats the
Python stdlib + numpy can parse — PCM WAV (``wave``), uncompressed 24-bit
BMP, binary PPM (``struct``), PNG across the FULL profile surface the spec
defines (all five color types incl. palette and grayscale, bit depths
1-16, Adam7 interlace; ``zlib`` inflate + full None/Sub/Up/Average/Paeth
unfiltering), and JFIF JPEG — baseline SOF0 and progressive SOF2, any
integer-ratio sampling, restart intervals (T.81 Huffman + IDCT,
:mod:`.jpeg`) — and raises ``NotImplementedError`` for formats needing
external codecs (MP4 needs pyav, absent in this container) or JPEG modes
beyond DCT+Huffman (arithmetic/lossless/12-bit); that raise is the
production-decoder hook.
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
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the decode/feature stage.
ASSET_FEATURES_SCHEMA = (
    "asset_id long, modality string, byte_len long, content_sha256 string, "
    "feat_mean double, feat_dim int, frames_sampled int"
)


def _decode_wav(payload: bytes) -> tuple[list[float], int]:
    """PCM WAV → (8-segment normalized RMS vector, PCM frame count).

    Segment RMS is a numpy reduction (exact int64 sum of squares, one
    float64 divide+sqrt per segment — same values the per-sample Python
    loop produced, minus the loop)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        full_scale = 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        full_scale = 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    if samples.size == 0:
        return [0.0] * 8, 0
    seg = max(1, samples.size // 8)
    sq = samples * samples
    feats = []
    for i in range(8):
        chunk = sq[i * seg : (i + 1) * seg]
        if chunk.size == 0:
            chunk = sq[-seg:]
        rms = float(int(chunk.sum()) / chunk.size) ** 0.5
        feats.append(rms / full_scale)
    return feats, n_frames


def _mean_rgb_mat(pixels: "np.ndarray", count: int) -> list[float]:
    """(n, 3) uint8 RGB matrix → normalized per-channel means. Sums are
    exact int64 (a 2^53-safe superset of the old per-byte int accumulation)."""
    if not count:
        return [0.0, 0.0, 0.0]
    sums = pixels.sum(axis=0, dtype=np.int64)
    return [int(s) / count / 255.0 for s in sums]


def _decode_bmp(payload: bytes) -> tuple[list[float], int]:
    """Uncompressed 24-bit BI_RGB BMP → ([mean_r, mean_g, mean_b], 1).
    The padded raster is sliced as a (rows, stride) numpy view; the BGR→RGB
    flip is a column reorder, not a per-pixel loop."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    row_stride = (width * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    n_rows = abs(height)
    raster = payload[data_offset : data_offset + row_stride * n_rows]
    if len(raster) < row_stride * n_rows:
        raise ValueError("truncated BMP raster")
    mat = np.frombuffer(raster, dtype=np.uint8).reshape(n_rows, row_stride)
    bgr = mat[:, : width * 3].reshape(-1, 3)
    return _mean_rgb_mat(bgr[:, ::-1], width * n_rows), 1


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
    if len(raster) < width * height * 3:
        raise ValueError("truncated PPM raster")
    mat = np.frombuffer(raster, dtype=np.uint8).reshape(-1, 3)
    return _mean_rgb_mat(mat, width * height), 1


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


# Optional native unfilter kernel. Average/Paeth rows are sequential BY SPEC
# (the predictor reads the decoded left pixel), so no vectorization exists for
# them; a ~40-line C loop is the production answer — ctypes is stdlib, the
# kernel compiles once per host (atomically cached in the temp dir, keyed by
# source hash) with `cc`, and every failure mode (no compiler, sandboxed tmp,
# load error) falls back silently to the numpy/Python lanes below, which are
# differential-tested byte-equal. On a real cluster the .so ships prebuilt in
# the wheel; this lazy path is the single-box/dev convenience.
_UNFILTER_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>

int png_unfilter(const uint8_t* raw, int64_t height, int64_t stride,
                 int64_t channels, uint8_t* out) {
    const uint8_t* prev = 0;
    for (int64_t r = 0; r < height; r++) {
        uint8_t f = raw[r * (stride + 1)];
        const uint8_t* src = raw + r * (stride + 1) + 1;
        uint8_t* line = out + r * stride;
        int64_t i;
        switch (f) {
        case 0:
            for (i = 0; i < stride; i++) line[i] = src[i];
            break;
        case 1:
            for (i = 0; i < channels && i < stride; i++) line[i] = src[i];
            for (i = channels; i < stride; i++)
                line[i] = (uint8_t)(src[i] + line[i - channels]);
            break;
        case 2:
            for (i = 0; i < stride; i++)
                line[i] = (uint8_t)(src[i] + (prev ? prev[i] : 0));
            break;
        case 3:
            for (i = 0; i < stride; i++) {
                int a = i >= channels ? line[i - channels] : 0;
                int b = prev ? prev[i] : 0;
                line[i] = (uint8_t)(src[i] + ((a + b) >> 1));
            }
            break;
        case 4:
            for (i = 0; i < stride; i++) {
                int a = i >= channels ? line[i - channels] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= channels) ? prev[i - channels] : 0;
                int p = a + b - c;
                int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                line[i] = (uint8_t)(src[i] + pred);
            }
            break;
        default:
            return (int)f; /* invalid filter type */
        }
        prev = line;
    }
    return -1; /* ok */
}
"""

_C_UNFILTER_CACHE: list = []  # [fn] once resolved; [None] if unavailable


def _c_unfilter_kernel():
    """Load (compiling if needed) the native unfilter; None when unavailable.
    Resolution happens once per process; the compiled artifact is shared
    per-host via an atomic rename, so 32 concurrent Python workers race
    safely."""
    if _C_UNFILTER_CACHE:
        return _C_UNFILTER_CACHE[0]
    fn = None
    try:
        import ctypes
        import os
        import subprocess
        import tempfile

        tag = hashlib.sha256(_UNFILTER_C_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(
            tempfile.gettempdir(), f"spark_graft_png_unfilter_{tag}.so"
        )
        if not os.path.exists(so_path):
            with tempfile.TemporaryDirectory() as tmp:
                c_path = os.path.join(tmp, "png_unfilter.c")
                with open(c_path, "w") as fh:
                    fh.write(_UNFILTER_C_SRC)
                tmp_so = os.path.join(tmp, "png_unfilter.so")
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                    check=True,
                    capture_output=True,
                    timeout=60,
                )
                os.replace(tmp_so, so_path)  # atomic: last writer wins
        lib = ctypes.CDLL(so_path)
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        fn = lib.png_unfilter
    except Exception:
        fn = None
    _C_UNFILTER_CACHE.append(fn)
    return fn


def _unfilter_average_row(line: "np.ndarray", prev: "np.ndarray", channels: int) -> None:
    """Average (filter 3) for one scanline, in place. The predictor reads the
    *decoded* left pixel, so the recurrence is sequential by spec; the loop
    runs over plain Python ints (lists) — ~3× faster than numpy scalar
    indexing — and only this row type and Paeth still loop at all."""
    cur = line.tolist()
    up = prev.tolist()
    for i in range(channels):
        cur[i] = (cur[i] + (up[i] >> 1)) & 0xFF
    for i in range(channels, len(cur)):
        cur[i] = (cur[i] + ((cur[i - channels] + up[i]) >> 1)) & 0xFF
    line[:] = cur


def _unfilter_paeth_row(line: "np.ndarray", prev: "np.ndarray", channels: int) -> None:
    """Paeth (filter 4) for one scanline, in place. Same sequential-by-spec
    structure as Average. ``pa = |p−a| = |b−c|`` does not depend on the
    decoded left pixel, so it is precomputed vectorized; the loop carries
    only the genuinely sequential terms."""
    cur = line.tolist()
    up = prev.tolist()
    stride = len(cur)
    # pa = |b - c| and (b - 2c) are left-independent → one vectorized pass
    bi = prev.astype(np.int16)
    ci = np.zeros(stride, dtype=np.int16)
    ci[channels:] = bi[:-channels]
    pa_pre = np.abs(bi - ci).tolist()
    bm2c = (bi - 2 * ci).tolist()
    c_pre = ci.tolist()
    for i in range(channels):
        cur[i] = (cur[i] + up[i]) & 0xFF  # a = c = 0 → predictor is b
    for i in range(channels, stride):
        a = cur[i - channels]
        c = c_pre[i]
        pb = a - c
        if pb < 0:
            pb = -pb
        pc = a + bm2c[i]
        if pc < 0:
            pc = -pc
        pa = pa_pre[i]
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = up[i]
        else:
            pred = c
        cur[i] = (cur[i] + pred) & 0xFF
    line[:] = cur


def _unfilter_scanlines(
    raw: bytes, height: int, stride: int, channels: int, use_native: bool = True
) -> "np.ndarray":
    """Decode the inflated PNG byte stream (filter byte + scanline per row)
    into a (height, stride) uint8 matrix. Three lanes, all byte-identical
    (differential tests vs tools/png_scalar_reference.py):

    1. Native C kernel via ctypes when a host compiler is available — one
       call per image, C-speed for every filter type (the production lane).
    2. Numpy otherwise: None is a memcpy, Up is one wrapping uint8 add, Sub
       is a per-channel prefix sum mod 256 (the decoded row IS the running
       sum of the raw deltas); Average/Paeth — whose predictor reads the
       *decoded* left pixel, sequential by spec — fall to the tightened
       per-pixel row kernels.
    """
    if use_native:
        kernel = _c_unfilter_kernel()
        if kernel is not None:
            out = np.empty((height, stride), dtype=np.uint8)
            rc = kernel(raw, height, stride, channels, out.ctypes.data)
            if rc >= 0:
                raise ValueError(f"invalid PNG filter type {rc}")
            return out
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    bad = filters[(filters > 4)]
    if bad.size:
        raise ValueError(f"invalid PNG filter type {int(bad[0])}")
    out = np.ascontiguousarray(arr[:, 1:])
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        f = int(filters[r])
        line = out[r]
        if f == 0:  # None
            pass
        elif f == 1:  # Sub → per-channel cumulative sum mod 256
            csum = np.cumsum(line.reshape(-1, channels), axis=0, dtype=np.uint32)
            line[:] = (csum & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up → wrapping uint8 add
            np.add(line, prev, out=line)
        elif f == 3:
            _unfilter_average_row(line, prev, channels)
        else:  # f == 4
            _unfilter_paeth_row(line, prev, channels)
        prev = line
    return out


# Adam7 interlace pass geometry: (x_start, y_start, x_step, y_step). Every
# pixel belongs to exactly one pass, so channel SUMS over the passes equal
# the sums over the de-interlaced image — the mean-RGB feature contract
# never needs pixel re-positioning.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
    (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
# Samples per pixel and legal bit depths per color type (PNG spec §11.2.2).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _png_pass_dims(width: int, height: int, p: int) -> tuple[int, int]:
    xs, ys, xstep, ystep = _ADAM7[p]
    return (
        max(0, (width - xs + xstep - 1) // xstep),
        max(0, (height - ys + ystep - 1) // ystep),
    )


def _png_subimage_rgb_sums(
    mat: "np.ndarray",
    width: int,
    color_type: int,
    bit_depth: int,
    palette: "np.ndarray | None",
) -> tuple["np.ndarray", int]:
    """Unfiltered scanline bytes of one (sub)image → (RGB channel sums on
    the 0-255 scale, pixel count). All lanes are whole-matrix numpy: 16-bit
    samples recombine as big-endian pairs and rescale by /257 (65535→255);
    sub-byte gray/palette samples unpack MSB-first via ``np.unpackbits``;
    palette indices gather through the PLTE matrix; gray replicates to the
    three channels; alpha is excluded (the RGB/RGBA parity contract).
    Integer-valued float64 sums are exact below 2^53."""
    ch = _PNG_CHANNELS[color_type]
    if bit_depth == 16:
        arr = mat.reshape(mat.shape[0], -1).astype(np.float64)
        px = ((arr[:, 0::2] * 256.0 + arr[:, 1::2]) / 257.0).reshape(-1, ch)
    elif bit_depth == 8:
        px = mat.reshape(-1, ch).astype(np.float64)
    else:  # 1/2/4-bit gray values or palette indices, packed MSB-first
        bits = np.unpackbits(mat, axis=1)
        groups = bits[:, : (bits.shape[1] // bit_depth) * bit_depth].reshape(
            mat.shape[0], -1, bit_depth
        )
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint16)
        vals = (groups * weights).sum(axis=2)[:, :width].astype(np.float64)
        if color_type == 0:  # spec sample scaling: max sample → 255
            vals *= 255.0 / ((1 << bit_depth) - 1)
        px = vals.reshape(-1, 1)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = px[:, 0].astype(np.int64)
        if idx.size and int(idx.max()) >= palette.shape[0]:
            raise ValueError("PNG palette index out of range")
        rgb = palette[idx]
    elif color_type in (0, 4):
        g = px[:, 0]
        rgb = np.stack([g, g, g], axis=1)
    else:
        rgb = px[:, :3]
    return rgb.sum(axis=0), rgb.shape[0]


def _decode_png(payload: bytes) -> tuple[list[float], int]:
    """PNG → ([mean_r, mean_g, mean_b], 1), stdlib + numpy only, covering
    the FULL profile surface the spec defines: all five color types
    (grayscale, truecolor, palette, gray+alpha, RGBA), every legal bit
    depth (1/2/4/8/16), and both interlace methods (none / Adam7).

    A real decoder, not a sniffer: chunk CRCs are verified (zlib.crc32),
    IDAT fragments are concatenated and inflated as one zlib stream, and
    every scanline filter the spec defines (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) is unfiltered byte-exactly — vectorized per row where the
    spec's data dependencies allow (see :func:`_unfilter_scanlines`;
    filter offsets use the spec's bytes-per-pixel, so 16-bit and RGBA
    strides unfilter with the same kernels). Adam7 streams decode pass by
    pass; because every pixel is in exactly one pass, the mean-RGB
    contract needs only per-pass channel sums, never de-interleaving.
    Alpha is parsed but excluded from the channel means so RGB and RGBA
    containers of the same pixels featurize identically (matching the
    BMP/PPM contract); 16-bit samples rescale by 1/257 so a ×257-widened
    8-bit image featurizes identically to its 8-bit original. Malformed
    payloads (truncated chunks/CRCs, corrupt deflate streams, illegal
    IHDR combinations, missing PLTE) raise ``ValueError``, the same
    contract as the other codecs."""
    if payload[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        # bound covers data AND the trailing CRC word: a chunk whose data
        # fits but whose CRC is cut off is truncated, not a struct.error
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
            bit_depth, color_type, _comp, _filt, interlace = data[8:13]
        elif ctype == b"PLTE":
            if length % 3 or length == 0:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = (
                np.frombuffer(data, dtype=np.uint8)
                .reshape(-1, 3)
                .astype(np.float64)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if (
        color_type not in _PNG_DEPTHS
        or bit_depth not in _PNG_DEPTHS[color_type]
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"illegal PNG IHDR (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    channels = _PNG_CHANNELS[color_type]
    bpp = max(1, channels * bit_depth // 8)  # spec filter byte offset
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc

    def sub_stride(w: int) -> int:
        return (w * channels * bit_depth + 7) // 8

    if interlace == 0:
        passes = [(width, height)]
    else:  # Adam7: empty passes contribute zero bytes (spec §8.2)
        passes = [_png_pass_dims(width, height, p) for p in range(7)]
    expected = sum((sub_stride(pw) + 1) * ph for pw, ph in passes if pw and ph)
    if len(raw) != expected:
        raise ValueError("PNG pixel data size mismatch")
    count = width * height
    if not count:
        return [0.0] * 3, 1
    total = np.zeros(3, dtype=np.float64)
    seen = 0
    offset = 0
    for pw, ph in passes:
        if not pw or not ph:
            continue
        st = sub_stride(pw)
        seg = raw[offset : offset + (st + 1) * ph]
        offset += (st + 1) * ph
        decoded = _unfilter_scanlines(seg, ph, st, bpp)
        sums, n = _png_subimage_rgb_sums(decoded, pw, color_type, bit_depth, palette)
        total += sums
        seen += n
    if seen != count:
        raise ValueError("PNG pixel count mismatch")
    return [float(s) / count / 255.0 for s in total], 1


def _decode_jpeg(payload: bytes) -> tuple[list[float], int]:
    """JFIF (baseline SOF0 or progressive SOF2) → ([mean_r, mean_g,
    mean_b], 1) via the T.81 codec in :mod:`.jpeg` (marker parse → Huffman
    → dequant → IDCT → YCbCr→RGB). Arithmetic/lossless/12-bit modes raise
    the PIL plug-in hook from inside the codec."""
    from . import jpeg as _jpeg

    rgb = _jpeg.decode_baseline_jpeg(payload)
    if rgb.shape[-1] == 1:  # grayscale: replicate to RGB means
        rgb = np.repeat(rgb, 3, axis=-1)
    count = rgb.shape[0] * rgb.shape[1]
    return _mean_rgb_mat(rgb.reshape(-1, 3), count), 1


def decode_asset(payload: bytes, modality: str) -> tuple[list[float], int]:
    """Real decoder: magic-sniffs the stdlib-decodable formats and extracts
    (feature_vector, frame_count). Formats beyond the built-in codecs raise
    ``NotImplementedError`` — the hook where PIL/torchaudio/pyav plug in on a
    production image."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:8] == _PNG_SIGNATURE:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        f"no stdlib codec for this {modality} payload "
        f"(magic={payload[:4]!r}); plug PIL/torchaudio/pyav into decode_asset"
    )


def _lcg_bytes(seed: int, n: int) -> bytes:
    """Deterministic pseudo-random bytes (LCG) — engine-portable test data.

    Vectorized via the LCG closed form x_k = A^k·x₀ + C·(A^{k-1}+…+1):
    powers and geometric partial sums are uint64 prefix scans whose natural
    mod-2⁶⁴ wraparound is exact for the mod-2³² recurrence (2³² | 2⁶⁴), so
    the stream is bit-identical to the sequential loop (differential-tested
    against tools/png_scalar_reference.py) at numpy speed."""
    if n <= 0:
        return b""
    x0 = np.uint64((seed * 2654435761 + 1) & 0xFFFFFFFF)
    pow_a = np.multiply.accumulate(np.full(n, 1664525, dtype=np.uint64))
    geo = np.cumsum(np.concatenate(([np.uint64(1)], pow_a[:-1])), dtype=np.uint64)
    xk = (pow_a * x0 + np.uint64(1013904223) * geo) & np.uint64(0xFFFFFFFF)
    return ((xk >> np.uint64(16)) & np.uint64(0xFF)).astype(np.uint8).tobytes()


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
    # same logical pixels for a given seed. RGB→BGR is a column reorder into
    # the stride-padded raster view — no per-pixel loop.
    pix = np.frombuffer(_lcg_bytes(seed, width * height * 3), dtype=np.uint8)
    raster_mat = np.zeros((height, row_stride), dtype=np.uint8)
    raster_mat[:, : width * 3] = (
        pix.reshape(height, width, 3)[:, :, ::-1].reshape(height, width * 3)
    )
    raster = raster_mat.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + raster_size, 0, 0, 54,  # file header: size, reserved, data offset
        40, width, height, 1, 24, 0, raster_size, 2835, 2835, 0, 0,  # BITMAPINFOHEADER
    )
    return header + bytes(raster)


def make_ppm_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic binary PPM (P6) payload."""
    return b"P6\n%d %d\n255\n" % (width, height) + _lcg_bytes(seed, width * height * 3)


def make_jpeg_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic baseline JFIF payload holding the same logical LCG RGB
    pixels as the PPM/BMP/PNG containers for a given seed. JPEG is LOSSY —
    quantization is part of the format — so cross-container tests compare
    its decoded channel means with a tolerance (DC quant steps 16/17 bound
    the per-block mean shift) while the entropy layer itself is pinned
    bit-exact by the DCT-domain round-trip tests."""
    pix = np.frombuffer(_lcg_bytes(seed, width * height * 3), dtype=np.uint8)
    from . import jpeg as _jpeg

    return _jpeg.encode_baseline_jpeg(pix.reshape(height, width, 3))


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
    stride = width * channels
    rgb = np.frombuffer(_lcg_bytes(seed, width * height * 3), dtype=np.uint8)
    img = rgb.reshape(height, width, 3)
    if rgba:
        img = np.concatenate(
            [img, np.full((height, width, 1), 255, dtype=np.uint8)], axis=2
        )
    lines = np.ascontiguousarray(img.reshape(height, stride))
    # ENCODING has no sequential dependency — every predictor input (left,
    # up, up-left) is an original pixel, known up front — so all five filter
    # transforms vectorize over the whole image; each row then selects its
    # cycling r%5 variant. Byte-identical to the per-byte reference encoder
    # (differential test vs tools/png_scalar_reference.py).
    up = np.zeros_like(lines)
    up[1:] = lines[:-1]
    left = np.zeros_like(lines)
    left[:, channels:] = lines[:, :-channels]
    upleft = np.zeros_like(lines)
    upleft[:, channels:] = up[:, :-channels]
    ai = left.astype(np.int16)
    bi = up.astype(np.int16)
    ci = upleft.astype(np.int16)
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    paeth_pred = np.where(
        (pa <= pb) & (pa <= pc), ai, np.where(pb <= pc, bi, ci)
    ).astype(np.uint8)
    variants = np.stack(
        [
            lines,
            lines - left,  # Sub (uint8 wrap)
            lines - up,  # Up
            lines - ((ai + bi) >> 1).astype(np.uint8),  # Average
            lines - paeth_pred,  # Paeth
        ]
    )
    row_idx = np.arange(height)
    filtered = np.zeros((height, stride + 1), dtype=np.uint8)
    filtered[:, 0] = row_idx % 5
    filtered[:, 1:] = variants[row_idx % 5, row_idx]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6 if rgba else 2, 0, 0, 0)
    return (
        _PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(filtered.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def make_png_profile_bytes(
    seed: int,
    width: int = 8,
    height: int = 8,
    color_type: int = 2,
    bit_depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Deterministic PNG across the FULL profile surface: any legal
    (color_type, bit_depth) pair from the spec plus both interlace
    methods. All rows use filter 0 — the five-filter variety is already
    pinned by :func:`make_png_bytes`; THIS synthesizer exists so the
    differential tests can pin every sample-layout lane (palette gather,
    sub-byte unpack, 16-bit recombine, gray replicate, Adam7 pass walk)
    against an equivalent rendering of the same pixels. Sample content
    derives from the LCG stream; 16-bit samples are the 8-bit values
    ×257, so an image and its widened twin must featurize identically."""
    ch = _PNG_CHANNELS[color_type]
    if bit_depth not in _PNG_DEPTHS[color_type]:
        raise ValueError(f"illegal PNG profile ({color_type}, {bit_depth})")
    maxv = (1 << bit_depth) - 1
    base = np.frombuffer(_lcg_bytes(seed, width * height * 3), dtype=np.uint8)
    plte = b""
    if color_type == 3:
        n_entries = 1 << bit_depth
        plte = _lcg_bytes(seed + 1, 3 * n_entries)
        samples = (
            (base[: width * height] % n_entries)
            .reshape(height, width, 1)
            .astype(np.uint16)
        )
    elif color_type in (0, 4):
        g = base[: width * height].reshape(height, width, 1).astype(np.uint16)
        if bit_depth < 8:
            g >>= 8 - bit_depth
        elif bit_depth == 16:
            g *= 257
        samples = g
        if color_type == 4:
            samples = np.concatenate(
                [samples, np.full((height, width, 1), maxv, dtype=np.uint16)],
                axis=2,
            )
    else:
        rgb = base[: width * height * 3].reshape(height, width, 3).astype(np.uint16)
        if bit_depth == 16:
            rgb = rgb * 257
        samples = rgb
        if color_type == 6:
            samples = np.concatenate(
                [samples, np.full((height, width, 1), maxv, dtype=np.uint16)],
                axis=2,
            )

    def pack_rows(sub: "np.ndarray") -> bytes:
        h_ = sub.shape[0]
        flat = sub.reshape(h_, -1)
        if bit_depth == 16:
            inter = np.empty((h_, flat.shape[1] * 2), dtype=np.uint8)
            inter[:, 0::2] = (flat >> 8).astype(np.uint8)
            inter[:, 1::2] = (flat & 0xFF).astype(np.uint8)
            rows = inter
        elif bit_depth == 8:
            rows = flat.astype(np.uint8)
        else:
            bits = (
                ((flat[..., None] >> np.arange(bit_depth - 1, -1, -1)) & 1)
                .astype(np.uint8)
                .reshape(h_, -1)
            )
            pad = (-bits.shape[1]) % 8
            if pad:
                bits = np.concatenate(
                    [bits, np.zeros((h_, pad), dtype=np.uint8)], axis=1
                )
            rows = np.packbits(bits, axis=1)
        return b"".join(b"\x00" + r.tobytes() for r in rows)

    if interlace == 0:
        raw = pack_rows(samples)
    else:
        raw = b"".join(
            pack_rows(samples[ys::ystep, xs::xstep])
            for xs, ys, xstep, ystep in _ADAM7
            if samples[ys::ystep, xs::xstep].size
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    out = _PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
    if plte:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw, 6)) + _png_chunk(b"IEND", b"")


# Named profile stripes for synthesize_codec_assets_from_documents: each one
# routes a contract-level slice of the driver-checked real-decode query
# through a decoder lane the profile tests pin in isolation (4:2:0 MCU
# interleave + restart resync, progressive scan scripts, palette gather,
# Adam7 pass walk, 16-bit recombine).

def make_jpeg420_bytes(seed: int, width: int = 32, height: int = 16) -> bytes:
    """Deterministic baseline JFIF at 4:2:0 with restart markers every MCU
    (32×16 → two 16×16 MCUs, so DRI/RSTn actually fires)."""
    pix = np.frombuffer(_lcg_bytes(seed, width * height * 3), dtype=np.uint8)
    from . import jpeg as _jpeg

    return _jpeg.encode_baseline_jpeg(
        pix.reshape(height, width, 3), subsampling="420", restart_interval=1
    )


def make_jpeg_progressive_bytes(seed: int, width: int = 16, height: int = 16) -> bytes:
    """Deterministic PROGRESSIVE JFIF (SOF2, libjpeg-shaped scan script,
    one successive-approximation level) at 4:2:2."""
    pix = np.frombuffer(_lcg_bytes(seed, width * height * 3), dtype=np.uint8)
    from . import jpeg as _jpeg

    return _jpeg.encode_progressive_jpeg(
        pix.reshape(height, width, 3), subsampling="422", al=1
    )


def make_png_palette_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic indexed-color PNG (color type 3, 4-bit depth — PLTE
    gather + sub-byte unpack lanes)."""
    return make_png_profile_bytes(seed, width, height, color_type=3, bit_depth=4)


def make_png_interlaced_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic Adam7-interlaced truecolor PNG."""
    return make_png_profile_bytes(
        seed, width, height, color_type=2, bit_depth=8, interlace=1
    )


def make_png16_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic 16-bit truecolor PNG (samples = 8-bit values ×257, so
    it featurizes identically to its 8-bit twin)."""
    return make_png_profile_bytes(seed, width, height, color_type=2, bit_depth=16)


def fake_decode(
    payload: bytes, modality: str, digest: bytes | None = None
) -> tuple[list[float], int]:
    """Deterministic stand-in decoder: derives a tiny 'feature vector' from
    the payload's sha256 and a 'frame count' from its length — stable across
    runs/engines, exercising the exact data shapes of a real decoder.
    ``digest`` lets a caller that already hashed the payload (the feature
    extractor emits content_sha256 anyway) pass it in instead of hashing the
    bytes a second time — sha256 is O(payload bytes), the dominant cost of
    this decoder on large assets (r15, guide §1.2 per-task work)."""
    if digest is None:
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
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                payload = bytes(content) if content is not None else b""
                # Hash ONCE per asset: content_sha256 needs it anyway, and
                # the fake decoder accepts the digest instead of re-hashing
                # the full payload (identical bytes → identical features).
                sha = hashlib.sha256(payload)
                if use_real_decoder:
                    feats, frames = decode_asset(payload, modality)
                else:
                    feats, frames = fake_decode(payload, modality, sha.digest())
                rows.append(
                    {
                        "asset_id": asset_id,
                        "modality": modality,
                        "byte_len": len(payload),
                        "content_sha256": sha.hexdigest(),
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
    (WAV / BMP / PPM / PNG / JPEG, seeded by doc_id) so
    ``extract_features(..., use_real_decoder=True)`` exercises actual
    decoding — zlib inflate + scanline unfiltering on the PNG rows, Huffman
    + IDCT on the JPEG rows. The stripe set covers the decoder's full
    profile surface at contract level: plain 4:4:4 JPEG, 4:2:0 with
    restart markers, progressive SOF2, five-filter PNG, palette / Adam7 /
    16-bit PNG profiles. Generation runs in mapInPandas — payloads are
    born on executors, never on the driver."""
    out_schema = "asset_id long, modality string, content binary, mime_type string"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = [
            ("audio", "audio/wav", make_wav_bytes),
            ("image", "image/bmp", make_bmp_bytes),
            ("image", "image/x-portable-pixmap", make_ppm_bytes),
            ("image", "image/png", make_png_bytes),
            ("image", "image/jpeg", make_jpeg_bytes),
            ("image", "image/jpeg", make_jpeg420_bytes),
            ("image", "image/jpeg", make_jpeg_progressive_bytes),
            ("image", "image/png", make_png_palette_bytes),
            ("image", "image/png", make_png_interlaced_bytes),
            ("image", "image/png", make_png16_bytes),
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
