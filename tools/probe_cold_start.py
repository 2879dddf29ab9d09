"""Decompose the cold start: per-stage wall time of the FIRST frames.

Round-4/5 cold starts record warmup_s[0] ~= 245-262 s at 4K while a single
fused-pass compile through today's relay measures ~8.5 s
(tools/probe_compile_overlap.py) — so serialized bucket compiles alone do
not explain frame 0. This probe times the sub-steps of the first two
process() calls (jax init, backend construction, first H2D, and the
pipeline's own stage waterfall) so the dominant term gets a name.

Run on the real chip: python tools/probe_cold_start.py [--res 4k]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
from smh_tpu import jax_cache  # noqa: E402

jax_cache.enable()  # the env var alone is dead on jax 0.9.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k", choices=["4k", "1440p", "1080p"])
    args = ap.parse_args()
    w, h = {"4k": (3840, 2160), "1440p": (2560, 1440), "1080p": (1920, 1080)}[args.res]

    out: dict = {}
    t0 = time.perf_counter()
    import jax

    out["import_jax_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    dev = jax.devices()
    out["devices_s"] = round(time.perf_counter() - t0, 2)
    out["platform"] = dev[0].platform

    import numpy as np

    t0 = time.perf_counter()
    x = jax.device_put(np.zeros((256, 256), np.uint8))
    np.asarray(x)
    out["first_device_put_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))
    out["first_tiny_jit_s"] = round(time.perf_counter() - t0, 2)

    sys.path.insert(0, ".")
    from smh_tpu import testing
    from smh_tpu.squadex.capture import Frame
    from smh_tpu.vision.pipeline import DebugBox, VisionState
    from smh_tpu.settings import Settings

    t0 = time.perf_counter()
    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    from smh_tpu.ocr.smhocr import SmhOcrEngine

    state = VisionState(settings=settings, ocr_engine=SmhOcrEngine())
    out["build_state_s"] = round(time.perf_counter() - t0, 2)

    frames = []
    for i in range(3):
        frames.append(
            testing.make_frame(
                w,
                h,
                marker_lines=[((120 + 7 * i, 150), (700 + 7 * i, 520))],
                scale_texts=[("300m", (60, 170))],
                scale_bars=[(60, 200, 120, 1)],
            )
        )

    for i in range(3):
        debug = DebugBox()
        t0 = time.perf_counter()
        res = state.process(Frame(frames[i], 96), debug=debug)
        total = time.perf_counter() - t0
        assert res is not None
        out[f"frame{i}_s"] = round(total, 2)
        shares = {k: round(v, 2) for k, v in debug.timeshares.as_dict().items() if v > 0.05}
        out[f"frame{i}_stages_s"] = shares
        out[f"frame{i}_unattributed_s"] = round(
            total - sum(debug.timeshares.stages.values()), 2
        )
    from smh_tpu.ops import pipeline as ops_pipeline

    out["jit_traces"] = ops_pipeline.trace_census()
    state.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
