"""Measure whether the remote compile service overlaps CONCURRENT compiles.

Round-4 finding: cold start is serialized bucket compiles (~12-16 s each
through the relay's compile service, minutes when congested). If two jit
compiles issued from two threads overlap server-side (or at least pipeline
their RTTs), the warmup ladder can be compiled in parallel and the cold
start divides by the concurrency. If the service strictly serializes,
parallel warmup buys nothing and the round-4 floor stands documented.

Method: compile the REAL fused pass (_analyze_packed_flat) at N
never-before-seen resolutions (odd sizes miss every cache) serially, then
at N more odd sizes concurrently from N threads, and compare wall time.
Run on the real chip: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python
tools/probe_compile_overlap.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
from smh_tpu import jax_cache  # noqa: E402

jax_cache.enable()  # the env var alone is dead on jax 0.9.0

import numpy as np  # noqa: E402


def compile_one(w: int, h: int) -> float:
    """Wall seconds for one full pipeline dispatch+fetch at an uncached
    resolution (dominated by the remote compile)."""
    from smh_tpu import consts as C, testing
    from smh_tpu.vision.tpu_backend import TpuBackend

    frame = testing.make_frame(w, h, marker_lines=[((50, 50), (200, 120))])
    be = TpuBackend()
    t0 = time.perf_counter()
    be.load_frame(frame)
    out = be.crop_to_map(True)
    assert out is not None
    be.find_marker_lines(C.LSD_MAX_GAP)
    return time.perf_counter() - t0


def main() -> None:
    # Warm the march/jax-init so only the fused-pass compiles are measured.
    compile_one(962, 542)

    serial_sizes = [(1922, 1082), (1926, 1086)]
    conc_sizes = [(1930, 1090), (1934, 1094)]

    t0 = time.perf_counter()
    serial_each = [compile_one(w, h) for (w, h) in serial_sizes]
    serial_s = time.perf_counter() - t0

    results: dict[int, float] = {}

    def worker(i: int, w: int, h: int) -> None:
        results[i] = compile_one(w, h)

    threads = [
        threading.Thread(target=worker, args=(i, w, h))
        for i, (w, h) in enumerate(conc_sizes)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_s = time.perf_counter() - t0

    print(json.dumps({
        "serial_each_s": [round(s, 1) for s in serial_each],
        "serial_total_s": round(serial_s, 1),
        "concurrent_each_s": [round(results[i], 1) for i in sorted(results)],
        "concurrent_total_s": round(conc_s, 1),
        "overlap_speedup": round(serial_s / conc_s, 2) if conc_s else None,
    }))


if __name__ == "__main__":
    main()
