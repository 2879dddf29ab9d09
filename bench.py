"""Benchmark: full frame -> markers + scales pipeline on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The metric of record (BASELINE.md): p50 latency of the full 4K
frame->markers+scales pipeline on one chip. The north-star target is 8 ms;
vs_baseline = 8ms / p50 (>1.0 means the target is beaten). The reference
publishes no numbers (BASELINE.json "published": {}), so the north star is
the baseline.

Run on the real TPU: python bench.py            (also: --res 1080p, --quick)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: first-compile of the fused pass through
# the remote compile service can take minutes; cached reruns start instantly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402


def build_state():
    from smh_tpu.ocr import FakeOcrEngine, OcrResult
    from smh_tpu.settings import Settings
    from smh_tpu.vision.pipeline import VisionState

    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    # The OCR engine seam is benchmarked separately; the canned engine keeps
    # the scales branch (preprocess + bar scan) in the measured path without
    # requiring traineddata in the image.
    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    return VisionState(settings=settings, ocr_engine=ocr)


def make_bench_frames(w: int, h: int, n: int = 4) -> list[np.ndarray]:
    """Distinct frames per iteration so the unchanged-frame fast paths
    (ui-checksum skip, OCR result cache, capture crc dedup) cannot flatter
    the numbers: every measured frame does full work."""
    from smh_tpu import testing

    frames = []
    for i in range(n):
        off = i * 7
        frame = testing.make_frame(
            w,
            h,
            marker_lines=[
                ((120 + off, 150), (700 + off, 520)),
                ((w // 4, h // 3 + off), (w // 4 + 450, h // 3 + 60 + off)),
            ],
            scale_bars=[(60, 200, 120, 1)],  # fixed: the canned OCR bbox points here
        )
        # Perturb a patch inside the BRQ so the OCR-preprocess image differs
        # per frame and the scales path cannot hit its unchanged-input cache.
        from smh_tpu import consts as C

        g = C.map_geometry(w, h)
        frame[g.brq_y + 300 + off : g.brq_y + 310 + off, g.brq_x + 300 : g.brq_x + 340, :3] = 255
        frames.append(frame)
    return frames


def run_batch_mode(w: int, h: int, res: str, iters: int, batch: int = 8) -> None:
    """Throughput mode: B frames per dispatch, one fetch per batch (the
    BASELINE "streaming capture loop, batched frames" config)."""
    from smh_tpu.ocr import FakeOcrEngine, OcrResult
    from smh_tpu.vision.batch import BatchPipeline

    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    bp = BatchPipeline(w, h, batch=batch, ocr_engine=ocr)
    base = make_bench_frames(w, h, n=batch)

    for _ in range(2):
        results = bp.process(base)
    assert all(not r.sleeping and r.markers for r in results)

    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        results = bp.process(base)
        lat.append(time.perf_counter() - t0)

    per_frame_ms = statistics.median(lat) * 1000.0 / batch
    print(
        json.dumps(
            {
                "metric": f"{res}_batched_throughput_per_frame",
                "value": round(per_frame_ms, 3),
                "unit": "ms",
                "vs_baseline": round(8.0 / per_frame_ms, 4),
                "fps_per_chip": round(1000.0 / per_frame_ms, 2),
                "batch": batch,
                "markers_detected": len(results[0].markers),
            }
        )
    )


def run_stream_mode(w: int, h: int, res: str, seconds: float = 10.0) -> None:
    """Sustained live-loop throughput with the double-buffered (pipelined)
    VisionLoop: frames in flight overlap upload/dispatch with fetch/host."""
    import itertools
    import threading

    from smh_tpu.squadex.capture import CaptureThread, Frame
    from smh_tpu.vision.pipeline import VisionLoop

    state = build_state()
    frames = make_bench_frames(w, h, n=4)

    class Cycle:
        def __init__(self):
            self.it = itertools.cycle(frames)

        def grab(self):
            return Frame(next(self.it), 96)

    n_updates = [0]
    lock = threading.Lock()

    def on_update(r, d):
        with lock:
            n_updates[0] += 1

    cap = CaptureThread(Cycle(), hz=1000).start()
    loop = VisionLoop(state, cap, on_update, fps=1000, pipelined=True).start()
    # warmup (compiles)
    deadline = time.time() + 300
    while n_updates[0] < 3 and time.time() < deadline:
        time.sleep(0.1)
    with lock:
        n0 = n_updates[0]
    t0 = time.perf_counter()
    time.sleep(seconds)
    with lock:
        n1 = n_updates[0]
    elapsed = time.perf_counter() - t0
    loop.stop()
    cap.stop()
    state.close()

    fps = (n1 - n0) / elapsed
    per_frame_ms = 1000.0 / fps if fps > 0 else float("inf")
    print(
        json.dumps(
            {
                "metric": f"{res}_pipelined_stream_throughput",
                "value": round(per_frame_ms, 3),
                "unit": "ms",
                "vs_baseline": round(8.0 / per_frame_ms, 4),
                "fps_per_chip": round(fps, 2),
                "frames": n1 - n0,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k", choices=["4k", "1440p", "1080p"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--mode", default="latency", choices=["latency", "batch", "stream"])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    w, h = {"4k": (3840, 2160), "1440p": (2560, 1440), "1080p": (1920, 1080)}[args.res]
    iters = 8 if args.quick else args.iters

    if args.mode == "batch":
        run_batch_mode(w, h, args.res, max(4, iters // 2), batch=args.batch)
        return
    if args.mode == "stream":
        run_stream_mode(w, h, args.res, seconds=5.0 if args.quick else 10.0)
        return

    from smh_tpu.squadex.capture import Frame

    state = build_state()
    frames = [Frame(f, dpi=96) for f in make_bench_frames(w, h)]

    # Warmup: compile all buckets (fused pass + red gate + ray march). First
    # compile through a remote compile service can take minutes; progress
    # goes to stderr so a watching driver knows the bench is alive.
    for i in range(3):
        t0 = time.perf_counter()
        res = state.process(frames[i % len(frames)])
        print(f"warmup {i}: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    assert res is not None and len(res.markers) >= 1, "bench frame must detect"

    lat = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = state.process(frames[i % len(frames)])
        lat.append(time.perf_counter() - t0)
    state.close()

    lat_ms = sorted(v * 1000.0 for v in lat)
    p50 = statistics.median(lat_ms)
    p90 = lat_ms[int(0.9 * (len(lat_ms) - 1))]
    fps = 1000.0 / p50

    print(
        json.dumps(
            {
                "metric": f"{args.res}_frame_to_markers_scales_p50_latency",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(8.0 / p50, 4),
                "p90_ms": round(p90, 3),
                "fps_per_chip": round(fps, 2),
                "iters": iters,
                "markers_detected": len(res.markers),
                "meters_to_px_ratio": res.meters_to_px_ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
