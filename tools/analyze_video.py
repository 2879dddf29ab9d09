"""Offline gameplay-recording analysis: video -> per-frame detections JSONL.

The batched counterpart of the live loop (VideoSource -> vision/batch.py):
decodes a recording, runs B frames per TPU dispatch, and prints one JSON
line per analyzed frame with markers / minimap / scale ratio. The
throughput-mode answer to the reference's live-only design.

Usage:
  python tools/analyze_video.py clip.mp4 [--batch 8] [--step 3] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--step", type=int, default=1, help="analyze every Nth frame")
    ap.add_argument("--limit", type=int, default=0, help="stop after N analyzed frames")
    ap.add_argument("--ocr", choices=["auto", "none"], default="auto")
    args = ap.parse_args()

    from smh_tpu.ocr import tesseract
    from smh_tpu.squadex.capture import VideoSource
    from smh_tpu.vision.batch import BatchPipeline

    src = VideoSource(args.video, step=args.step)
    engine = tesseract.create_default_engine() if args.ocr == "auto" else None

    bp = None
    n = 0
    emitted = 0
    pending = []
    in_flight = None  # previous batch's job: collected while the next decodes
    t0 = time.time()

    def emit(results):
        nonlocal emitted
        for r in results:
            out = {
                "frame": emitted,
                "sleeping": r.sleeping,
                "markers": [[[l.p0.x, l.p0.y], [l.p1.x, l.p1.y]] for l in r.markers],
                "meters_to_px_ratio": r.meters_to_px_ratio,
                "minimap": None
                if r.minimap_bounds is None
                else [r.minimap_bounds.left, r.minimap_bounds.top,
                      r.minimap_bounds.right, r.minimap_bounds.bottom],
            }
            print(json.dumps(out), flush=True)
            emitted += 1

    def flush():
        """Pipelined: submit this batch, then collect the PREVIOUS one —
        the device chews the new batch while the host handles the old."""
        nonlocal bp, n, in_flight
        if not pending:
            return
        if bp is None:
            h, w = pending[0].shape[:2]
            bp = BatchPipeline(w, h, batch=args.batch, ocr_engine=engine)
        job = bp.submit(pending)
        n += len(pending)
        if in_flight is not None:
            emit(bp.collect(in_flight))
        in_flight = job
        pending.clear()

    for img in src.iter_frames():
        if args.limit and n + len(pending) >= args.limit:
            break
        pending.append(img)
        if len(pending) == args.batch:
            flush()
    if args.limit:
        pending[:] = pending[: max(0, args.limit - n)]
    flush()
    if in_flight is not None:
        emit(bp.collect(in_flight))
    src.close()
    if bp is not None:
        bp.close()
    dt = time.time() - t0
    print(f"analyzed {n} frames in {dt:.1f}s ({n/max(dt,1e-9):.1f} fps)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
