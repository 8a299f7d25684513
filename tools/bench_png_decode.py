"""PNG decode-lane before/after measurement (round-8 directive 4).

Compares the preserved per-byte reference decoder
(tools/png_scalar_reference.py — the pre-round-8 engine code) against the
production lane in functions/multimodal.py at several image sizes, for both
the native (ctypes C kernel) and forced-numpy fallback paths.

Usage: python tools/bench_png_decode.py  → one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from quill_agent_dashboard_pbi_etl_spark.functions import multimodal as mm
from tools import png_scalar_reference as ref


def best_of(fn, *args, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def decode_numpy_only(payload: bytes):
    """Production decoder with the native kernel suppressed (fallback lane)."""
    saved = list(mm._C_UNFILTER_CACHE)
    mm._C_UNFILTER_CACHE.clear()
    mm._C_UNFILTER_CACHE.append(None)
    try:
        return mm._decode_png(payload)
    finally:
        mm._C_UNFILTER_CACHE.clear()
        mm._C_UNFILTER_CACHE.extend(saved)


def main() -> None:
    out = {"native_kernel": mm._c_unfilter_kernel() is not None, "sizes": {}}
    for w, h in ((8, 8), (64, 64), (256, 256), (512, 512)):
        payload = mm.make_png_bytes(7, w, h)
        scalar = best_of(ref.decode_png_scalar, payload)
        numpy_lane = best_of(decode_numpy_only, payload)
        prod = best_of(mm._decode_png, payload)
        assert mm._decode_png(payload) == ref.decode_png_scalar(payload)
        out["sizes"][f"{w}x{h}"] = {
            "scalar_ms": round(scalar * 1e3, 3),
            "numpy_ms": round(numpy_lane * 1e3, 3),
            "production_ms": round(prod * 1e3, 3),
            "speedup_numpy": round(scalar / numpy_lane, 2),
            "speedup_production": round(scalar / prod, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
