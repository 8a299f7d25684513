"""JPEG (ITU-T T.81 DCT, Huffman) codec — stdlib+numpy.

The multimodal real-decode lane's compressed-image tier beyond PNG: a
genuine JFIF decoder (marker parse → Huffman entropy decode with
byte-unstuffing and DC prediction → dequantize → 2-D IDCT → level shift →
YCbCr→RGB) plus the matching encoders used by the deterministic asset
synthesizer. Profiles supported: 8-bit sequential BASELINE (SOF0) and
PROGRESSIVE (SOF2 — multi-scan spectral selection + successive
approximation with EOB-run batching, the scan shape libjpeg emits by
default), standard component layout (1 or 3 components), ANY sampling
layout with integer ratios — 4:4:4, 4:2:2, 4:2:0, 4:1:1 — decoded in
T.81 MCU order (non-interleaved scans walk each component's TRUE block
grid) with box-replication chroma upsampling (the encoders emit 4:4:4,
4:2:2 and 4:2:0 with mean box downsampling), and restart intervals
(DRI + RSTn resync with DC-predictor/EOB-run reset — what hardware
encoders emit). Arithmetic coding, lossless/hierarchical modes, and
12-bit precision raise ``NotImplementedError`` — the same PIL plug-in
hook as the other codecs. Malformed streams raise ``ValueError`` (the
codec contract).

Quantization/Huffman tables are the T.81 Annex K examples (public spec
material). JPEG is lossy, so unlike PNG the synthesizer round-trip is
pinned by golden DECODED feature vectors plus a DCT-domain exactness
check (the decoder must recover the encoder's quantized coefficients
bit-for-bit; the lossy step is quantization alone), not by byte equality
with the source pixels.

Scale shape: like the PNG lane, decode runs executor-side inside
``mapInPandas`` over binary columns — per-asset numpy work, no shuffle of
the wide payload column.
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.81 Annex K example tables (spec Tables K.1, K.2) -------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL symbols)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient in scan order.
_Z = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> "np.ndarray":
    """8×8 orthonormal DCT-II matrix: D @ block @ D.T is the 2-D forward
    DCT with the T.81 normalization (scaled so quantization tables apply
    directly)."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    d[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return d


_DCT = _dct_matrix()


def _build_huffman(spec) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (code, length)} (canonical T.81 assignment)."""
    counts, symbols = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _build_decode_table(spec) -> dict[tuple[int, int], int]:
    """BITS/HUFFVAL → {(length, code): symbol} for the decoder side."""
    return {(ln, code): sym for sym, (code, ln) in _build_huffman(spec).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_align(self) -> None:
        """Pad with 1-bits to the byte boundary (the spec's pre-marker pad)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def write_marker(self, marker_low: int) -> None:
        """Emit a bare 0xFF<m> marker into the scan (RSTn) — byte-aligned
        and exempt from byte stuffing by definition."""
        self.pad_align()
        self.buf += bytes([0xFF, marker_low])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; raises ValueError
    on markers inside the scan or exhaustion."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside JPEG scan")
                self.pos += 1  # skip stuffed 0x00
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def consume_restart(self, n: int) -> None:
        """Byte-align (discarding the 1-bit pad) and consume the expected
        RSTn marker (T.81 E.1.4: markers sit on byte boundaries and are
        never stuffed)."""
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected JPEG restart marker")
        if self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("JPEG restart marker out of sequence")
        self.pos += 2


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value → (category t, t-bit code) for Huffman coding."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# --- Encoder ---------------------------------------------------------------


# (h_factor, v_factor) per component for the supported sampling layouts.
SAMPLING_FACTORS = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def _plane_quantized_blocks(plane: "np.ndarray", qt: "np.ndarray") -> "np.ndarray":
    """Level-shifted plane (dims multiples of 8) → (n_blocks, 64) int32
    zigzag-quantized coefficients, blocks row-major, one einsum pass."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    q = coef / qt[None]
    quant = np.sign(q) * np.floor(np.abs(q) + 0.5)  # half away from zero
    return quant.astype(np.int32).reshape(-1, 64)[:, _Z]


def forward_quantized_components(
    rgb: "np.ndarray", subsampling: str = "444"
) -> list["np.ndarray"]:
    """Encoder forward path up to (and including) quantization — the lossy
    step — for any supported sampling layout. Returns one (n_blocks, 64)
    int32 zigzag-ordered coefficient array per component (Y, Cb, Cr),
    blocks in row-major plane order. The image pads to the MCU grid
    (16×16 for 4:2:0) by edge replication BEFORE chroma downsampling, so
    the 2×2 / 1×2 chroma box averages never read past the image. This is
    exactly what the decoder's entropy layer must recover bit-for-bit
    (:func:`decode_quantized_components`); the exactness tests close the
    encoder↔decoder loop at the only boundary where equality is defined."""
    if subsampling not in SAMPLING_FACTORS:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    factors = SAMPLING_FACTORS[subsampling]
    hmax = max(hi for hi, _ in factors)
    vmax = max(vi for _, vi in factors)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = -h % (8 * vmax), -w % (8 * hmax)
    padded = np.pad(rgb, ((0, ph), (0, pw), (0, 0)), mode="edge")
    r = padded[..., 0].astype(np.float64)
    g = padded[..., 1].astype(np.float64)
    b = padded[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    comps = []
    for plane, qt, (hi, vi) in (
        (y, QUANT_LUMA, factors[0]),
        (cb, QUANT_CHROMA, factors[1]),
        (cr, QUANT_CHROMA, factors[2]),
    ):
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # standard box downsample (mean of fy×fx cell)
            plane = plane.reshape(
                plane.shape[0] // fy, fy, plane.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        comps.append(_plane_quantized_blocks(plane - 128.0, qt))
    return comps


def forward_quantized_coefficients(rgb: "np.ndarray") -> list["np.ndarray"]:
    """The 4:4:4 forward path (historical surface; see
    :func:`forward_quantized_components`)."""
    return forward_quantized_components(rgb, "444")


def _encode_block(writer: "_BitWriter", zz, dc_tab, ac_tab, pred, ci) -> None:
    """Entropy-code one zigzag block (DPCM DC + run/size AC, F.1.2)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, bits = _magnitude(diff)
    code, ln = dc_tab[t]
    writer.write(code, ln)
    if t:
        writer.write(bits, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | t]
        writer.write(code, ln)
        writer.write(bits, t)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        writer.write(code, ln)


def encode_baseline_jpeg(
    rgb: "np.ndarray", subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (Annex K tables), at
    4:4:4 (default), 4:2:2, or 4:2:0 chroma sampling, optionally with
    restart markers every ``restart_interval`` MCUs (DRI + RSTn, the
    resync points hardware encoders emit).

    Forward path is fully vectorized (:func:`forward_quantized_components`:
    JFIF RGB→YCbCr, chroma box downsample, all-blocks DCT via one einsum,
    integer quantization); only the entropy coding walks blocks in Python
    (bit IO is inherently sequential), interleaved in T.81 MCU order
    (hi×vi luma blocks then one block per chroma component per MCU)."""
    h, w = rgb.shape[:2]
    comps = forward_quantized_components(rgb, subsampling)
    factors = SAMPLING_FACTORS[subsampling]
    hmax = max(hi for hi, _ in factors)
    vmax = max(vi for _, vi in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    dc_tabs = (_build_huffman(DC_LUMA_SPEC), _build_huffman(DC_CHROMA_SPEC))
    ac_tabs = (_build_huffman(AC_LUMA_SPEC), _build_huffman(AC_CHROMA_SPEC))
    writer = _BitWriter()
    pred = [0, 0, 0]
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.write_marker(0xD0 + ((mcu_i // restart_interval - 1) & 7))
                pred = [0, 0, 0]
            mcu_i += 1
            for ci in range(3):
                hi, vi = factors[ci]
                cols = mcus_x * hi
                dc_tab = dc_tabs[0 if ci == 0 else 1]
                ac_tab = ac_tabs[0 if ci == 0 else 1]
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * cols + (mx * hi + bx)
                        _encode_block(writer, comps[ci][bi], dc_tab, ac_tab, pred, ci)
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: "np.ndarray") -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table.reshape(-1)[_Z]))

    def dht(cls: int, tid: int, spec) -> bytes:
        counts, symbols = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols))

    hv = [(hi << 4) | vi for hi, vi in factors]
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof = seg(
        0xFFC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, hv[0], 0, 2, hv[1], 1, 3, hv[2], 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, QUANT_LUMA)
        + dqt(1, QUANT_CHROMA)
        + sof
        + dht(0, 0, DC_LUMA_SPEC)
        + dht(1, 0, AC_LUMA_SPEC)
        + dht(0, 1, DC_CHROMA_SPEC)
        + dht(1, 1, AC_CHROMA_SPEC)
        + dri
        + sos
        + scan
        + b"\xff\xd9"
    )


def _encode_ac_first_block(writer, band, al, ac_tab) -> None:
    """Progressive AC first pass for one block's band (T.81 G.1.2.2):
    point-transformed values (abs >> Al, truncation toward zero, sign
    kept), run/size coding, per-block EOB (EOBRUN=1 — legal, unbatched)."""
    run = 0
    emitted_any = False
    last_nz = -1
    temps = []
    for v in band:
        t = (abs(int(v)) >> al)
        temps.append(-t if v < 0 else t)
    for i, t in enumerate(temps):
        if t != 0:
            last_nz = i
    for i in range(last_nz + 1):
        t = temps[i]
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)
            run -= 16
        size, bits = _magnitude(t)
        code, ln = ac_tab[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
        run = 0
        emitted_any = True
    if last_nz < len(band) - 1 or not emitted_any:
        code, ln = ac_tab[0x00]  # EOB (run of 1)
        writer.write(code, ln)


def _encode_ac_refine_block(writer, band, al, ac_tab) -> None:
    """Progressive AC refinement (Ah = Al+1 → Al) for one block's band
    (T.81 G.1.2.3 / the jcphuff algorithm): newly-significant coefficients
    (|v|>>Al == 1) get run/size-1 symbols + a sign bit; already-significant
    ones queue a correction bit ((|v|>>Al) & 1) flushed after the next
    symbol; trailing correction bits flush after a per-block EOB."""
    p1_temps = [abs(int(v)) >> al for v in band]
    signs = [1 if int(v) >= 0 else -1 for v in band]
    newly = [i for i, t in enumerate(p1_temps) if t == 1]
    eob_idx = (newly[-1] + 1) if newly else 0
    run = 0
    pending: list[int] = []

    def flush() -> None:
        for bit in pending:
            writer.write(bit, 1)
        pending.clear()

    for i in range(eob_idx):
        t = p1_temps[i]
        if t == 0:
            run += 1
            continue
        # Emit required ZRLs BEFORE handling this coefficient — for
        # already-significant coefficients too (the jcphuff note: a
        # correction coefficient past a >15 zero run must queue its bit
        # AFTER the ZRL that covers those zeros, or the decoder — which
        # reads correction bits inline while consuming the ZRL's 16-zero
        # span — desyncs). Inside i < eob_idx a trailing fold into EOB is
        # impossible, so emit unconditionally.
        while run > 15:
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)
            flush()
            run -= 16
        if t > 1:  # already significant: queue its correction bit
            pending.append(t & 1)
            continue
        code, ln = ac_tab[(run << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if signs[i] > 0 else 0, 1)
        flush()
        run = 0
    tail = [p1_temps[i] & 1 for i in range(eob_idx, len(band)) if p1_temps[i] > 1]
    if eob_idx < len(band) or pending or tail:
        code, ln = ac_tab[0x00]  # EOB: decoder refines the band remainder
        writer.write(code, ln)
        flush()
        for bit in tail:
            writer.write(bit, 1)


def encode_progressive_jpeg(
    rgb: "np.ndarray",
    subsampling: str = "444",
    al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → PROGRESSIVE JFIF bytes (SOF2) carrying the
    SAME quantized coefficients as :func:`encode_baseline_jpeg` — the two
    encodings must decode pixel-identical, which is exactly what the tests
    assert. Scan script (spectral selection + one successive-approximation
    level, the shape libjpeg's default script uses):

      1. DC first, all components interleaved, Al=``al``
      2. AC first, one scan per component, band 1-63, Al=``al``
      3. DC refinement, interleaved, Ah=``al`` → Al=``al``-1 … down to 0
      4. AC refinement, one scan per component, same ladder

    ``al=0`` degenerates to pure spectral selection (no refinement scans).
    ``restart_interval`` emits DRI + RSTn inside EVERY scan — the restart
    unit is the MCU for interleaved DC scans and the block for
    single-component scans (T.81 E.1.4), with DC predictors reset at each
    marker (AC scans here carry no cross-block state: EOB runs are
    per-block).
    """
    if al < 0 or al > 13:
        raise ValueError("al out of range")
    h, w = rgb.shape[:2]
    comps = forward_quantized_components(rgb, subsampling)
    factors = SAMPLING_FACTORS[subsampling]
    _f, hmax, vmax, mcus_x, mcus_y, layouts, true_grids = _frame_geometry(
        h, w, [(1, 0, hi, vi) for hi, vi in factors]
    )

    dc_tabs = (_build_huffman(DC_LUMA_SPEC), _build_huffman(DC_CHROMA_SPEC))
    ac_tabs = (_build_huffman(AC_LUMA_SPEC), _build_huffman(AC_CHROMA_SPEC))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(scomps, ss, se, ah, a_l) -> bytes:
        body = bytes([len(scomps)])
        for cs, td, ta in scomps:
            body += bytes([cs, (td << 4) | ta])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | a_l]))

    scans: list[bytes] = []

    ri = restart_interval

    def maybe_restart(writer, unit_i, pred=None) -> None:
        if ri and unit_i and unit_i % ri == 0:
            writer.write_marker(0xD0 + ((unit_i // ri - 1) & 7))
            if pred is not None:
                for i in range(len(pred)):
                    pred[i] = 0

    # 1. DC first: interleaved over the padded MCU grid
    writer = _BitWriter()
    pred = [0, 0, 0]
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            maybe_restart(writer, mcu_i, pred)
            mcu_i += 1
            for ci in range(3):
                hi, vi = factors[ci]
                cols = layouts[ci][1]
                dc_tab = dc_tabs[0 if ci == 0 else 1]
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * cols + (mx * hi + bx)
                        v = int(comps[ci][bi][0]) >> al  # arithmetic shift
                        t, bits = _magnitude(v - pred[ci])
                        pred[ci] = v
                        code, ln = dc_tab[t]
                        writer.write(code, ln)
                        if t:
                            writer.write(bits, t)
    scans.append(sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, al) + writer.flush())

    # 2. AC first per component: its TRUE block grid, band 1-63
    for ci in range(3):
        writer = _BitWriter()
        rows, cols_t = true_grids[ci]
        cols = layouts[ci][1]
        ac_tab = ac_tabs[0 if ci == 0 else 1]
        unit_i = 0
        for r in range(rows):
            for c in range(cols_t):
                maybe_restart(writer, unit_i)
                unit_i += 1
                _encode_ac_first_block(
                    writer, comps[ci][r * cols + c][1:], al, ac_tab
                )
        scans.append(sos([(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, 0, al) + writer.flush())

    # 3+4. successive-approximation ladder down to Al=0
    for cur in range(al, 0, -1):
        lo = cur - 1
        # DC refinement: one raw bit per block, interleaved, no Huffman
        writer = _BitWriter()
        mcu_i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart(writer, mcu_i)
                mcu_i += 1
                for ci in range(3):
                    hi, vi = factors[ci]
                    cols = layouts[ci][1]
                    for by in range(vi):
                        for bx in range(hi):
                            bi = (my * vi + by) * cols + (mx * hi + bx)
                            writer.write((int(comps[ci][bi][0]) >> lo) & 1, 1)
        scans.append(
            sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, cur, lo) + writer.flush()
        )
        # AC refinement per component
        for ci in range(3):
            writer = _BitWriter()
            rows, cols_t = true_grids[ci]
            cols = layouts[ci][1]
            ac_tab = ac_tabs[0 if ci == 0 else 1]
            unit_i = 0
            for r in range(rows):
                for c in range(cols_t):
                    maybe_restart(writer, unit_i)
                    unit_i += 1
                    _encode_ac_refine_block(
                        writer, comps[ci][r * cols + c][1:], lo, ac_tab
                    )
            scans.append(
                sos([(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, cur, lo)
                + writer.flush()
            )

    def dqt(tid: int, table: "np.ndarray") -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table.reshape(-1)[_Z]))

    def dht(cls: int, tid: int, spec) -> bytes:
        counts, symbols = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols))

    hv = [(hi << 4) | vi for hi, vi in factors]
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof2 = seg(
        0xFFC2,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, hv[0], 0, 2, hv[1], 1, 3, hv[2], 1]),
    )
    dri = seg(0xFFDD, struct.pack(">H", ri)) if ri else b""
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, QUANT_LUMA)
        + dqt(1, QUANT_CHROMA)
        + sof2
        + dht(0, 0, DC_LUMA_SPEC)
        + dht(1, 0, AC_LUMA_SPEC)
        + dht(0, 1, DC_CHROMA_SPEC)
        + dht(1, 1, AC_CHROMA_SPEC)
        + dri
        + b"".join(scans)
        + b"\xff\xd9"
    )


# --- Decoder ---------------------------------------------------------------


def _frame_geometry(h: int, w: int, comps):
    """Shared MCU geometry (T.81 A.1.1/A.2.3): per-component sampling
    factors, MCU counts, the MCU-PADDED storage layouts, and each
    component's TRUE block grid (ceil of its own dims — what
    non-interleaved scans walk; the padded layout's extra blocks are
    interleave-only dummies). Single-component frames are non-interleaved
    by definition: factors collapse to 1:1 and the grids coincide."""
    ncomp = len(comps)
    if ncomp == 1:
        factors = [(1, 1)]
        hmax = vmax = 1
        mcus_y, mcus_x = (h + 7) // 8, (w + 7) // 8
    else:
        factors = [(hi, vi) for _cid, _tq, hi, vi in comps]
        hmax = max(hi for hi, _ in factors)
        vmax = max(vi for _, vi in factors)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    layouts = [(mcus_y * vi, mcus_x * hi) for hi, vi in factors]
    true_grids = [
        (
            (-(-h * vi // vmax) + 7) // 8,  # block rows of comp's own dims
            (-(-w * hi // hmax) + 7) // 8,  # block cols
        )
        for hi, vi in factors
    ]
    return factors, hmax, vmax, mcus_x, mcus_y, layouts, true_grids


def _scan_entropy_end(payload: bytes, start: int) -> int:
    """First byte after ``start`` where a REAL marker begins: skips stuffed
    0xFF00 byte pairs and RSTn markers (both legal inside entropy data)."""
    pos = start
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= n:
            return n
        nxt = payload[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
            continue
        return pos
    return n


def _parse_jpeg_structure(payload: bytes):
    """Marker walk → ``(h, w, comps, progressive, qtables, scans)``.

    Each scan record carries everything its entropy data needs — the
    participating components (frame index + DC/AC table ids), spectral
    band (Ss/Se), successive-approximation bits (Ah/Al), a SNAPSHOT of the
    Huffman tables in force (DHT may redefine tables between scans), the
    restart interval in force, and the raw entropy byte slice — so the
    baseline and progressive decoders below are pure entropy loops."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    scans: list[dict] = []
    saw_eoi = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:
            saw_eoi = True
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        if length < 2 or pos + 2 + length > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:  # DQT
            bpos = 0
            while bpos + 65 <= len(body):
                pq_tq = body[bpos]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quant tables; plug PIL into decode_asset"
                    )
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_Z] = np.frombuffer(body[bpos + 1 : bpos + 65], dtype=np.uint8)
                qtables[pq_tq & 0xF] = tbl.reshape(8, 8)
                bpos += 65
        elif marker == 0xFFC4:  # DHT (may appear between scans)
            bpos = 0
            while bpos + 17 <= len(body):
                cls_tid = body[bpos]
                counts = list(body[bpos + 1 : bpos + 17])
                n = sum(counts)
                symbols = list(body[bpos + 17 : bpos + 17 + n])
                if len(symbols) < n:
                    raise ValueError("truncated JPEG Huffman table")
                htables[(cls_tid >> 4, cls_tid & 0xF)] = _build_decode_table(
                    (counts, symbols)
                )
                bpos += 17 + n
        elif marker in (0xFFC0, 0xFFC2):  # SOF0 baseline / SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(
                    "non-8-bit JPEG precision; plug PIL into decode_asset"
                )
            progressive = marker == 0xFFC2
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("illegal JPEG sampling factors")
                comps.append((cid, tq, hi, vi))
            frame = (h, w, comps)
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "non-baseline/progressive JPEG (extended/lossless/"
                "arithmetic); plug PIL into decode_asset"
            )
        elif marker == 0xFFDD:  # DRI: restart every N MCUs (0 = disabled)
            if len(body) >= 2:
                restart_interval = struct.unpack_from(">H", body)[0]
        elif marker == 0xFFDA:  # SOS
            if frame is None:
                raise ValueError("JPEG missing SOF/SOS")
            ns = body[0]
            cids = [c[0] for c in frame[2]]
            scomps = []
            for i in range(ns):
                cs, sel = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in cids:
                    raise ValueError("JPEG scan missing frame component")
                scomps.append((cids.index(cs), sel >> 4, sel & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            entropy_start = pos + 2 + length
            end = _scan_entropy_end(payload, entropy_start)
            scans.append(
                {
                    "comps": scomps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "tables": dict(htables),
                    "ri": restart_interval,
                    "data": payload[entropy_start:end],
                }
            )
            pos = end
            continue
        pos += 2 + length
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    if not saw_eoi:
        raise ValueError("JPEG missing EOI")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty JPEG frame")
    return h, w, comps, progressive, qtables, scans


def _refine_nonzero(reader: _BitReader, block, k: int, p1: int) -> None:
    """One correction bit for an already-significant coefficient (T.81
    G.1.2.3 / jdphuff semantics): move magnitude outward by 1<<Al unless
    the bit at Al is already set."""
    if reader.read_bit() and (int(block[k]) & p1) == 0:
        block[k] += p1 if block[k] >= 0 else -p1


def _decode_baseline_scan(h, w, comps, scan, blocks, layouts, factors,
                          mcus_x, mcus_y):
    """The single interleaved sequential scan (SOF0): DC DPCM + full AC
    band per data unit, MCU order, restart-interval aware."""
    ncomp = len(comps)
    if len(scan["comps"]) != ncomp:
        # A sequential scan covering a component subset is legal T.81
        # (non-interleaved sequential) — unsupported profile, not malformed.
        raise NotImplementedError(
            "non-interleaved sequential JPEG scan; plug PIL into decode_asset"
        )
    tabs = []
    for ci, td, ta in scan["comps"]:
        dc = scan["tables"].get((0, td))
        ac = scan["tables"].get((1, ta))
        if dc is None or ac is None:
            raise ValueError("JPEG scan references missing Huffman table")
        tabs.append((ci, dc, ac))
    reader = _BitReader(scan["data"])
    ri = scan["ri"]
    pred = [0] * ncomp
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_i and mcu_i % ri == 0:
                # byte-align, eat RSTn (mod-8 sequence), reset DC predictors
                reader.consume_restart((mcu_i // ri - 1) & 7)
                pred = [0] * ncomp
            mcu_i += 1
            for ci, dc_tab, ac_tab in tabs:
                hi, vi = factors[ci]
                cols = layouts[ci][1]
                for by in range(vi):
                    for bx in range(hi):
                        t = _huff_decode(reader, dc_tab)
                        if t > 11:
                            raise ValueError("invalid JPEG DC category")
                        pred[ci] += _extend(reader.read_bits(t), t) if t else 0
                        block = blocks[ci][(my * vi + by) * cols + (mx * hi + bx)]
                        block[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63 or size == 0:
                                raise ValueError("invalid JPEG AC run/size")
                            block[k] = _extend(reader.read_bits(size), size)
                            k += 1


def _decode_progressive_scans(h, w, comps, scans, blocks, layouts, factors,
                              mcus_x, mcus_y, true_grids):
    """Progressive (SOF2) entropy decode, T.81 G.2 / the jdphuff algorithm
    family: DC scans (interleaved or single-component) carry DPCM values at
    precision Al then one refinement bit per pass; AC scans are always
    single-component over the component's TRUE block grid, first-pass
    coding the band's coefficients at precision Al with EOB-run batching,
    refinement passes adding one magnitude bit per coefficient. EOBRUN and
    DC predictors reset at restart markers."""
    for scan in scans:
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        ri = scan["ri"]
        reader = _BitReader(scan["data"])
        if ss == 0:  # ---- DC scan (first or refinement) ----
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            tabs = {}
            for ci, td, _ta in scan["comps"]:
                if ah == 0:  # refinement scans need no Huffman table
                    dc = scan["tables"].get((0, td))
                    if dc is None:
                        raise ValueError("JPEG scan references missing Huffman table")
                    tabs[ci] = dc
            pred = {ci: 0 for ci, _td, _ta in scan["comps"]}

            def dc_unit(ci, bi):
                block = blocks[ci][bi]
                if ah == 0:
                    t = _huff_decode(reader, tabs[ci])
                    if t > 11:
                        raise ValueError("invalid JPEG DC category")
                    pred[ci] += _extend(reader.read_bits(t), t) if t else 0
                    block[0] = pred[ci] << al
                elif reader.read_bit():
                    block[0] |= 1 << al

            if len(scan["comps"]) > 1:  # interleaved: padded MCU walk
                mcu_i = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if ri and mcu_i and mcu_i % ri == 0:
                            reader.consume_restart((mcu_i // ri - 1) & 7)
                            pred = {k: 0 for k in pred}
                        mcu_i += 1
                        for ci, _td, _ta in scan["comps"]:
                            hi, vi = factors[ci]
                            cols = layouts[ci][1]
                            for by in range(vi):
                                for bx in range(hi):
                                    dc_unit(
                                        ci,
                                        (my * vi + by) * cols + (mx * hi + bx),
                                    )
            else:  # single component: its true grid, padded storage
                ci = scan["comps"][0][0]
                rows, cols_t = true_grids[ci]
                cols = layouts[ci][1]
                unit_i = 0
                for r in range(rows):
                    for c in range(cols_t):
                        if ri and unit_i and unit_i % ri == 0:
                            reader.consume_restart((unit_i // ri - 1) & 7)
                            pred = {k: 0 for k in pred}
                        unit_i += 1
                        dc_unit(ci, r * cols + c)
            continue

        # ---- AC scan: always one component, true grid ----
        if len(scan["comps"]) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (1 <= ss <= se <= 63):
            raise ValueError("invalid progressive spectral band")
        ci, _td, ta = scan["comps"][0]
        ac_tab = scan["tables"].get((1, ta))
        if ac_tab is None:
            raise ValueError("JPEG scan references missing Huffman table")
        rows, cols_t = true_grids[ci]
        cols = layouts[ci][1]
        p1 = 1 << al
        eobrun = 0
        unit_i = 0
        for r in range(rows):
            for c in range(cols_t):
                if ri and unit_i and unit_i % ri == 0:
                    reader.consume_restart((unit_i // ri - 1) & 7)
                    eobrun = 0
                unit_i += 1
                block = blocks[ci][r * cols + c]
                if ah == 0:  # ---- AC first pass ----
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _huff_decode(reader, ac_tab)
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run != 15:
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += reader.read_bits(run)
                                break
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > se:
                            raise ValueError("invalid progressive AC run")
                        block[k] = _extend(reader.read_bits(size), size) << al
                        k += 1
                else:  # ---- AC refinement pass ----
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _huff_decode(reader, ac_tab)
                            run, size = rs >> 4, rs & 15
                            val = 0
                            if size == 0:
                                if run != 15:
                                    eobrun = 1 << run
                                    if run:
                                        eobrun += reader.read_bits(run)
                                    break
                                # ZRL: skip 16 zero-history coefficients
                            else:
                                if size != 1:
                                    raise ValueError(
                                        "invalid progressive refinement size"
                                    )
                                val = p1 if reader.read_bit() else -p1
                            # advance over `run` zero-history coefficients,
                            # refining already-significant ones in passing
                            while k <= se:
                                if block[k] != 0:
                                    _refine_nonzero(reader, block, k, p1)
                                else:
                                    if run == 0:
                                        break
                                    run -= 1
                                k += 1
                            if val and k <= se:
                                block[k] = val
                            k += 1
                    if eobrun > 0:
                        # EOB run: every remaining nonzero-history coefficient
                        # in the band still gets its correction bit
                        while k <= se:
                            if block[k] != 0:
                                _refine_nonzero(reader, block, k, p1)
                            k += 1
                        eobrun -= 1


def _parse_and_entropy_decode(payload: bytes):
    """Shared decoder core: marker walk + Huffman entropy decode, baseline
    (SOF0, one interleaved scan) or progressive (SOF2, multi-scan spectral
    selection + successive approximation).

    Returns ``(h, w, comps, qtables, blocks, layouts)`` where ``comps`` is
    the SOF component list ``[(cid, tq, hi, vi), ...]`` and ``blocks`` is
    one (n_blocks, 64) int32 zigzag coefficient array per component — the
    exact data the encoder emitted (entropy coding is lossless;
    quantization is JPEG's only lossy step)."""
    h, w, comps, progressive, qtables, scans = _parse_jpeg_structure(payload)
    factors, _hmax, _vmax, mcus_x, mcus_y, layouts, true_grids = _frame_geometry(
        h, w, comps
    )
    blocks = [
        np.zeros((rows * cols, 64), dtype=np.int32) for rows, cols in layouts
    ]
    if progressive:
        _decode_progressive_scans(
            h, w, comps, scans, blocks, layouts, factors, mcus_x, mcus_y,
            true_grids,
        )
    else:
        if len(scans) != 1:
            # Legal per T.81 (sequential scans may be non-interleaved, one
            # per component) — valid-but-unsupported, NOT malformed, so it
            # falls through to the production-decoder hook.
            raise NotImplementedError(
                "multi-scan sequential JPEG; plug PIL into decode_asset"
            )
        _decode_baseline_scan(
            h, w, comps, scans[0], blocks, layouts, factors, mcus_x, mcus_y
        )
    return h, w, comps, qtables, blocks, layouts


def decode_quantized_components(payload: bytes) -> list["np.ndarray"]:
    """Per-component (n_blocks, 64) quantized DCT coefficients in zigzag
    order, blocks in row-major plane order — the encoder↔decoder exactness
    surface for ANY sampling layout (the entropy layer is lossless, so
    these must be bit-identical to what the encoder quantized)."""
    return _parse_and_entropy_decode(payload)[4]


def decode_quantized_coefficients(payload: bytes) -> "np.ndarray":
    """(n_blocks, n_components, 64) quantized DCT coefficients in zigzag
    order for SAME-GEOMETRY layouts (4:4:4 or grayscale) — the historical
    stacked contract surface. Subsampled layouts have per-component block
    counts; use :func:`decode_quantized_components` there."""
    _h, _w, _comps, _q, blocks, layouts = _parse_and_entropy_decode(payload)
    if len(set(layouts)) != 1:
        raise ValueError(
            "subsampled JPEG has per-component block grids; use "
            "decode_quantized_components"
        )
    return np.stack(blocks, axis=1)


def decode_baseline_jpeg(payload: bytes) -> "np.ndarray":
    """JFIF bytes → (h, w, 3) uint8 RGB (or (h, w, 1) grayscale): baseline
    SOF0 or progressive SOF2 (spectral selection + successive
    approximation — the multi-scan shape libjpeg emits by default), any
    sampling layout with integer ratios (4:4:4, 4:2:2, 4:2:0, 4:1:1).

    Entropy decode is the sequential Python part (bit IO); dequantize →
    IDCT → color convert run as one einsum/array pass over all blocks.
    Subsampled chroma upsamples by box replication (nearest neighbor) —
    T.81 leaves the upsampling filter to the decoder."""
    h, w, comps, qtables, blocks, layouts = _parse_and_entropy_decode(payload)
    ncomp = len(comps)
    hmax = max(hi for _cid, _tq, hi, _vi in comps) if ncomp > 1 else 1
    vmax = max(vi for _cid, _tq, _hi, vi in comps) if ncomp > 1 else 1
    planes = []
    for ci, (_cid, tq, hi, vi) in enumerate(comps):
        if ncomp == 1:
            hi = vi = 1
        if tq not in qtables:
            raise ValueError("JPEG frame references missing quant table")
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                "non-integer JPEG sampling ratio; plug PIL into decode_asset"
            )
        rows, cols = layouts[ci]
        coef = np.zeros((rows * cols, 64), dtype=np.float64)
        coef[:, _Z] = blocks[ci]
        coef = coef.reshape(-1, 8, 8) * qtables[tq][None]
        blk = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
        plane = (
            blk.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        )
        # component dims per T.81 A.1.1: ceil(size * factor / max_factor)
        ch_, cw_ = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = plane[:ch_, :cw_]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[..., None]
    if ncomp != 3:
        raise NotImplementedError(
            f"{ncomp}-component JPEG; plug PIL into decode_asset"
        )
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
