"""Benchmark: full frame -> markers + scales pipeline on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The metric of record (BASELINE.md): p50 latency of the full 4K
frame->markers+scales pipeline on one chip (value = sync e2e p50, directly
comparable with round 1). The north-star target is 8 ms; vs_baseline =
8ms / p50 (>1.0 means the target is beaten). The reference publishes no
numbers (BASELINE.json "published": {}), so the north star is the baseline.

The line also carries the decomposition the headline hides on this
latency-bound host relay (~25 ms/transfer D2H, ~20 MB/s):
  device_p50_ms        device compute only (resident input, block_until_ready)
  devfetch_p50_ms      device compute + the ONE hostpack D2H fetch
  markers_p50_ms       e2e with the scales branch async (production config)
  fps_pipelined        sustained double-buffered live-loop throughput
  batched_ms_per_frame 8-frame batch mode, per frame
  hostpack_bytes       steady-state critical-path payload (sparse sections)
  lsd_window_misses / scalespack_fetches  payload-machinery health counters

Measurement discipline: the sync p50 is the median of --reps independent
runs' medians (run-to-run link jitter swings single runs ~2x); distinct
frames per iteration defeat every unchanged-input fast path.

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
# The env var alone is DEAD on jax 0.9.0 (config stays None) — the real
# activation happens via smh_tpu.jax_cache.enable below; the env var is kept
# so child processes (worker) inherit the same directory.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402

from smh_tpu import jax_cache  # noqa: E402

jax_cache.enable()


def build_engine(ocr: str):
    if ocr == "tesseract":
        # The Tesseract ctypes binding, against real libtesseract when a
        # traineddata exists, else the in-repo smhtess C library + vendored
        # SMHT model. binary_ok=False => this measures the gray row-band
        # transport (the non-device engine path).
        from smh_tpu.ocr import tesseract as T

        if not T.available():
            import tempfile

            from smh_tpu.native import tessmock
            from smh_tpu.ocr.tessdata_gen import ensure_default

            so = tessmock.lib_path()
            assert so is not None, "no toolchain for smhtess"
            os.environ["SMH_TESS_LIB"] = str(so)
            tessdata = os.path.join(tempfile.gettempdir(), "smh_tessdata")
            ensure_default(tessdata)
            return T.TesseractEngine(tessdata=tessdata)
        return T.TesseractEngine()
    from smh_tpu.ocr.smhocr import SmhOcrEngine

    return SmhOcrEngine()


def build_state(scales_async: bool = False, ocr: str = "smhocr"):
    from smh_tpu.settings import Settings
    from smh_tpu.vision.pipeline import VisionState

    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    # Round 2: the measured path runs the REAL self-contained OCR engine on
    # rendered scale text (round 1 used a canned engine — less host work per
    # frame than this). Keeps the full glyph pipeline + band transport in
    # the measured numbers without requiring traineddata in the image.
    return VisionState(settings=settings, ocr_engine=build_engine(ocr), scales_async=scales_async)


def make_bench_frames(w: int, h: int, n: int = 4) -> list[np.ndarray]:
    """Distinct frames per iteration so the unchanged-frame fast paths
    (ui-checksum skip, OCR result cache, capture crc dedup) cannot flatter
    the numbers: every measured frame does full work, including a changed
    BRQ (the scalespack fetch fires every frame, as it would while the map
    pans in live play)."""
    from smh_tpu import consts as C, testing

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
            scale_texts=[("300m", (60, 170))],  # real glyphs for the real engine
            scale_bars=[(60, 200, 120, 1)],
        )
        # Perturb a patch inside the BRQ so the OCR-preprocess image differs
        # per frame and the scales path cannot hit its unchanged-input cache.
        g = C.map_geometry(w, h)
        frame[g.brq_y + 300 + off : g.brq_y + 310 + off, g.brq_x + 300 : g.brq_x + 340, :3] = 255
        frames.append(frame)
    return frames


def measure_process_p50(state, frames, iters: int, reps: int) -> tuple[float, float, list[float]]:
    """(median-of-medians p50 ms, p90 ms over all samples, per-rep p50s)."""
    all_ms: list[float] = []
    rep_p50s: list[float] = []
    for _ in range(reps):
        lat = []
        for i in range(iters):
            t0 = time.perf_counter()
            res = state.process(frames[i % len(frames)])
            lat.append((time.perf_counter() - t0) * 1000.0)
            assert res is not None
        rep_p50s.append(statistics.median(lat))
        all_ms.extend(lat)
    all_ms.sort()
    p90 = all_ms[int(0.9 * (len(all_ms) - 1))]
    return statistics.median(rep_p50s), p90, rep_p50s


def measure_device(backend, iters: int) -> tuple[float, float]:
    """(device-only p50 ms, device+fetch p50 ms) on the resident upload."""
    import jax

    from smh_tpu.ops import pipeline as ops_pipeline

    g = backend.geom
    (with_ocr, with_quiet, grayscale, crop_h, crop_w,
     pallas, inline, band, quiet_pallas, sparse) = backend._dispatch_flags

    from smh_tpu.vision.tpu_backend import ROI_CHANNELS

    def dispatch():
        return ops_pipeline._analyze_packed_flat(
            backend.rois_dev,
            map_h=g.map_h, map_w=g.map_w, btn_h=g.btn_h, btn_w=g.btn_w,
            grayscale=grayscale, with_ocr=with_ocr, with_quiet=with_quiet,
            crop_h=crop_h, crop_w=crop_w, pallas=pallas,
            quiet_pallas=quiet_pallas, scales_inline=inline,
            with_mask_output=(backend.lsd_engine != "native") or backend._debug,
            channels=ROI_CHANNELS, scales_band=band, sparse_budget=sparse,
        )

    jax.block_until_ready(dispatch()["hostpack"])  # warm
    # Sustained device rate: enqueue a back-to-back dispatch chain and sync
    # once — the inflight throttle converges the loop to the true per-dispatch
    # device cost. (block_until_ready on a single result is not a reliable
    # device-time probe through this relay.)
    chain = max(16, iters)
    t0 = time.perf_counter()
    out = None
    for _ in range(chain):
        out = dispatch()
    jax.block_until_ready(out["hostpack"])
    dev_ms = (time.perf_counter() - t0) * 1000.0 / chain
    devfetch = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = dispatch()
        np.asarray(out["hostpack"])
        devfetch.append((time.perf_counter() - t0) * 1000.0)
    return dev_ms, statistics.median(devfetch)


def measure_pipelined_fps(w: int, h: int, seconds: float) -> float:
    import itertools
    import threading

    from smh_tpu.squadex.capture import CaptureThread, Frame
    from smh_tpu.vision.pipeline import VisionLoop

    state = build_state(scales_async=True)
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

    # hz=60: enough to never starve the loop (it runs ~15-25 fps), without
    # the capture thread's per-grab crc32 (~12 ms at 4K) monopolizing the
    # 1-core host the way an uncapped 1000 Hz grab loop does.
    cap = CaptureThread(Cycle(), hz=60).start()
    loop = VisionLoop(state, cap, on_update, fps=1000, pipelined=True).start()
    deadline = time.time() + 300
    while n_updates[0] < 3 and time.time() < deadline:
        time.sleep(0.1)
    with lock:
        n0 = n_updates[0]
    t0 = time.perf_counter()
    # The relay occasionally stalls one exchange for tens of seconds; a
    # fixed window that catches a stall reports ~0 fps (or Infinity ms).
    # Keep measuring (up to 4x the window) until a handful of updates
    # landed so the number reflects the steady state.
    while True:
        time.sleep(0.25)
        elapsed = time.perf_counter() - t0
        with lock:
            n1 = n_updates[0]
        if elapsed >= seconds and (n1 - n0 >= 4 or elapsed >= 4 * seconds):
            break
    loop.stop()
    cap.stop()
    state.close()
    return (n1 - n0) / elapsed


def make_video_frames(w: int, h: int, n: int) -> list[np.ndarray]:
    """See smh_tpu.testing.make_video_frames — shared with the video-golden
    test so the benched sequence is the golden-pinned one."""
    from smh_tpu import testing

    return testing.make_video_frames(w, h, n)


def measure_batched(w: int, h: int, iters: int, batch: int = 8) -> tuple[float, dict]:
    """(ms per frame, chain stats) over a video-like sequence processed in
    consecutive PIPELINED batches (submit N+1 while N is in flight) —
    distinct content every frame, delta chain engaged."""
    from smh_tpu.ocr.smhocr import SmhOcrEngine
    from smh_tpu.vision.batch import BatchPipeline

    bp = BatchPipeline(w, h, batch=batch, ocr_engine=SmhOcrEngine())
    n_batches = max(3, iters)
    frames = make_video_frames(w, h, n=batch * (n_batches + 2))
    # Warm TWO batches: the first compiles the full-upload bucket and seeds
    # the chain; the second compiles the delta-scan bucket (the mode every
    # measured batch runs in).
    results = bp.process(frames[:batch])
    assert all(not r.sleeping and r.markers for r in results)
    bp.process(frames[batch : 2 * batch])
    stats0 = dict(bp.stats)
    lat: list[float] = []
    t_prev = time.perf_counter()
    batches = (frames[s * batch : (s + 1) * batch] for s in range(2, n_batches + 2))
    for rs in bp.stream(batches):
        assert all(not r.sleeping and r.markers for r in rs)
        now = time.perf_counter()
        lat.append(now - t_prev)
        t_prev = now
    stats = {k: bp.stats[k] - stats0.get(k, 0) for k in bp.stats}
    stats["h2d_bytes_per_frame"] = round(stats["h2d_bytes"] / (n_batches * batch))
    stats["lat_ms"] = [round(t * 1000.0, 1) for t in lat]
    bp.close()
    # Steady-state per-batch latency: the relay stalls single exchanges for
    # 10-20 s at random, independent of workload shape, and in a bad phase
    # HALF the batches can catch one — a plain median then measures the
    # stalls, not the pipeline. Trim: drop batches >5x a ROBUST floor (the
    # 25th-percentile batch — anchoring on min() would let a single
    # downside outlier reclassify legitimate batches as stalls), take the
    # median of the rest, and surface how many were trimmed. If trimming
    # would leave fewer than 3 batches, keep the full set: a tiny surviving
    # sample is worse than an honest stall-inclusive median.
    floor = sorted(lat)[max(0, (len(lat) - 1) // 4)]
    steady = [t for t in lat if t <= 5 * floor]
    if len(steady) < min(3, len(lat)):
        steady = lat
    stats["stalled_batches"] = len(lat) - len(steady)
    return statistics.median(steady) * 1000.0 / batch, stats


def measure_worker(w: int, h: int, iters: int, stream_s: float = 6.0) -> dict:
    """The co-located worker deployment shape (smh_tpu/worker.py), measured
    ACROSS the process boundary: shm frame write + socket signal + pipeline
    + result line back.

      worker_e2e_p50_ms   submit->result round trip, one frame in flight
                          (client waits; the worker sees request/response)
      worker_fps          sustained streaming rate (client submits as fast
                          as the ring accepts; worker pipelines depth 3)

    MUST run before the calling process touches jax: the worker owns the
    device client (two concurrent clients contend on this relay)."""
    import statistics as st
    import threading

    from smh_tpu.worker import WorkerClient

    results: dict[int, dict] = {}
    cond = threading.Condition()
    count = [0]

    def on_result(msg):
        with cond:
            results[msg["seq"]] = msg
            count[0] += 1
            cond.notify_all()

    wc = WorkerClient(w, h, on_result)
    out: dict = {}
    try:
        # Progress-aware wait: the child streams warming heartbeats every
        # ~15 s, so a congested compile can take as long as it takes while
        # a dead/mute child fails in minutes — and the error NAMES the
        # failure (exit code, warming progress, stderr tail) instead of
        # round 4's bare "worker never became ready" after a flat 900 s.
        if not wc.wait_ready_progress(idle_timeout=180.0, max_s=2400.0):
            raise RuntimeError(f"worker not ready: {wc.diagnose()}")
        if wc.ready_info is not None:
            out["worker_warmup_s"] = wc.ready_info.get("warmup_s")
            out["worker_attach_s"] = wc.ready_info.get("attach_s")
        frames = make_bench_frames(w, h)
        lats, sub_lats, pipe_lats = [], [], []
        for i in range(iters):
            img = frames[i % len(frames)]
            t0 = time.perf_counter()
            seq = wc.submit(img)
            t_sub = time.perf_counter()
            if seq is None:  # worker restarting mid-measure: retry the frame
                time.sleep(1.0)
                continue
            deadline = time.monotonic() + 300
            with cond:
                while seq not in results:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        # The result is LOST if the worker died with this
                        # frame in flight — never hang the whole bench on it.
                        raise RuntimeError(f"no worker result for seq {seq}")
                    cond.wait(min(left, 10.0))
            lats.append((time.perf_counter() - t0) * 1000.0)
            sub_lats.append((t_sub - t0) * 1000.0)
            msg = results.pop(seq)
            assert not msg["sleeping"] and msg["markers"], msg
            if msg.get("ms") is not None:
                pipe_lats.append(msg["ms"])  # worker-side process() time
        assert lats, "no worker latencies measured"
        out["worker_e2e_p50_ms"] = round(st.median(lats), 3)
        # Decomposition: e2e = shm publish (client copy) + socket + worker
        # pipeline (the "ms" the worker reports) + result line back. The
        # difference between e2e and submit+pipeline is pure IPC/scheduling.
        out["worker_submit_p50_ms"] = round(st.median(sub_lats), 3)
        if pipe_lats:
            out["worker_pipeline_p50_ms"] = round(st.median(pipe_lats), 3)
        # Streaming: saturate the ring; the worker's internal pipelining
        # overlaps its background fetches with the host stages.
        with cond:
            n0 = count[0]
        t0 = time.perf_counter()
        i = 0
        while time.perf_counter() - t0 < stream_s:
            wc.submit(frames[i % len(frames)])  # drops when ring is full
            i += 1
            time.sleep(0.001)
        with cond:
            while count[0] == n0 and time.perf_counter() - t0 < 4 * stream_s:
                cond.wait(1.0)
            n1 = count[0]
        elapsed = time.perf_counter() - t0
        out["worker_fps"] = round((n1 - n0) / elapsed, 2)
        out["worker_restarts"] = wc.restarts
    finally:
        wc.close()
    return out


def measure_corpus(res: str, iters: int) -> dict:
    """REAL-content perf: the reference screenshot corpus through the full
    per-frame pipeline (natives at 1440p; the 4K set is the nearest-upscaled
    stress corpus of tests/goldens/detections_4k.json). Real masks are
    denser than the synthetic bench frames — this is where the sparse
    budget, band ladder and scalespack machinery earn (or lose) their keep,
    so the counters ride along. Detections are sanity-checked against the
    pinned goldens (count equality; the exact values are CI's job)."""
    import json as _json
    import pathlib
    import statistics as st

    from smh_tpu import testing
    from smh_tpu.squadex.capture import Frame, load_frame_bgra

    samples = pathlib.Path("/root/reference/vision-common/samples")
    gdir = pathlib.Path(__file__).resolve().parent / "tests" / "goldens"
    if res == "4k":
        goldens = _json.loads((gdir / "detections_4k.json").read_text())
        frames = {
            n: testing.upscale_frame(load_frame_bgra(str(samples / n)), 3840, 2160)
            for n in goldens
        }
    else:
        goldens = {
            n: g
            for n, g in _json.loads((gdir / "detections.json").read_text()).items()
            if tuple(g.get("frame", ())) == (1440, 2560) and not g["sleeping"]
        }
        frames = {n: load_frame_bgra(str(samples / n)) for n in goldens}

    state = build_state()
    names = sorted(frames)
    # Warm every sample once (sparse-rung escalations on the dense frames
    # compile their buckets here, not in the measured loop).
    detect_ok = 0
    for n in names:
        r = state.process(Frame(frames[n], dpi=96))
        got = 0 if r is None else len(r.markers)
        want = len(goldens[n].get("lines", []))
        detect_ok += got == want
    backend = state.delegate.backend
    stats0 = dict(backend.stats)
    lat = []
    for it in range(iters):
        for n in names:
            t0 = time.perf_counter()
            state.process(Frame(frames[n], dpi=96))
            lat.append((time.perf_counter() - t0) * 1000.0)
    stats = {k: backend.stats[k] - stats0.get(k, 0) for k in backend.stats}
    lat.sort()
    out = {
        "corpus_p50_ms": round(st.median(lat), 3),
        "corpus_p90_ms": round(lat[int(0.9 * (len(lat) - 1))], 3),
        "corpus_samples": len(names),
        "corpus_detect_ok": detect_ok,
        "corpus_sparse_misses": stats.get("lsd_sparse_misses"),
        "corpus_window_misses": stats.get("lsd_window_misses"),
        "corpus_band_misses": stats.get("scales_band_misses"),
        "corpus_scalespack_fetches": stats.get("scalespack_fetches"),
        "corpus_h2d_bytes_per_frame": round(
            stats.get("h2d_bytes", 0) / max(1, iters * len(names))
        ),
        # Context for corpus_p50_ms: every sample is an UNRELATED screenshot,
        # so the delta transport degenerates to ~full uploads — this measures
        # the worst-case (map-switch) frame, not live play.
        "corpus_note": "unrelated frames = no temporal coherence (map-switch cost)",
    }

    # LIVE sequences on real content: one marker line DRAGGED across a real
    # screenshot per frame — real mask density + real background with the
    # temporal coherence an actual capture stream has (the delta transport's
    # design point). Steady-state p50 over the drag, first frame excluded.
    live_lat: list[float] = []
    stats1 = dict(backend.stats)
    for n in names[:3]:
        base = frames[n]
        for step in range(12):
            f = base.copy()
            testing.draw_marker_line(
                f, (80 + 12 * step, 90 + 4 * step), (520 + 12 * step, 420)
            )
            t0 = time.perf_counter()
            r = state.process(Frame(f, dpi=96))
            dt = (time.perf_counter() - t0) * 1000.0
            if step > 0:  # step 0 pays the map switch (measured above)
                live_lat.append(dt)
            assert r is not None
    stats2 = {k: backend.stats[k] - stats1.get(k, 0) for k in backend.stats}
    live_lat.sort()
    out["corpus_live_p50_ms"] = round(st.median(live_lat), 3)
    out["corpus_live_p90_ms"] = round(live_lat[int(0.9 * (len(live_lat) - 1))], 3)
    out["corpus_live_h2d_bytes_per_frame"] = round(
        stats2.get("h2d_bytes", 0) / max(1, len(live_lat) + 3)
    )
    out["corpus_live_sparse_misses"] = stats2.get("lsd_sparse_misses")
    state.close()
    return out


def measure_corpus_live(state, w: int, h: int, n_samples: int = 2,
                        steps: int = 10) -> dict:
    """Compact real-content measurement for FULL mode (VERDICT r4 item 5):
    live-drag sequences over real reference screenshots (nearest-resampled
    to the bench resolution), driven through the ALREADY-WARM bench state so
    it costs ~n_samples*steps relay frames, not a rebuild. Reports the
    steady live p50 + transport counters, and the map-switch cost (step 0:
    an unrelated frame = full re-upload) decomposed against the measured
    link bandwidth so the hiccup is attributed (pure link vs pipeline).
    Source frames: /root/reference/vision-common/samples (1440p natives)."""
    import pathlib
    import statistics as st

    from smh_tpu import testing
    from smh_tpu.squadex.capture import Frame, load_frame_bgra
    from smh_tpu.vision.pipeline import DebugBox

    samples = pathlib.Path("/root/reference/vision-common/samples")
    if not samples.is_dir():
        return {}
    names = sorted(
        p.name for p in samples.glob("*.png")
        if p.stat().st_size > 2_000_000  # full screenshots, not crops
    )[:n_samples]
    if not names:
        return {}
    # NB: the delegate's backend is created lazily on the first frame — and
    # in full mode it already exists and is warm; read it afresh after the
    # loop for the counter delta either way.
    live_lat: list[float] = []
    switch_lat: list[float] = []
    switch_stages: dict[str, list[float]] = {}
    switch_h2d: list[int] = []
    stats0 = dict(getattr(state.delegate.backend, "stats", None) or {})
    for n in names:
        base = testing.upscale_frame(load_frame_bgra(str(samples / n)), w, h)
        for step in range(steps):
            f = base.copy()
            testing.draw_marker_line(
                f, (80 + 12 * step, 90 + 4 * step), (520 + 12 * step, 420)
            )
            debug = DebugBox() if step == 0 else None
            pre_h2d = (getattr(state.delegate.backend, "stats", None) or {}).get(
                "h2d_bytes"
            )
            t0 = time.perf_counter()
            r = state.process(Frame(f, dpi=96), debug=debug)
            dt = (time.perf_counter() - t0) * 1000.0
            if step == 0:
                switch_lat.append(dt)
                # Per-stage decomposition of the map-switch frame: the stage
                # that dispatches+materializes the fused pass carries the
                # full re-upload's call-time transfer, so the waterfall
                # attributes the hiccup (link vs host pipeline) directly.
                for k, v in debug.timeshares.as_dict().items():
                    switch_stages.setdefault(k, []).append(v * 1000.0)
                post_h2d = (
                    getattr(state.delegate.backend, "stats", None) or {}
                ).get("h2d_bytes")
                if post_h2d is not None:  # pre is None when the lazy
                    # backend was only created by this very frame (counter
                    # started at 0 inside the call either way)
                    switch_h2d.append(post_h2d - (pre_h2d or 0))
            elif step > 1:  # step 1 may still pay rung escalation
                live_lat.append(dt)
            assert r is not None
    stats = {
        k: v - stats0.get(k, 0)
        for k, v in dict(
            getattr(state.delegate.backend, "stats", None) or {}
        ).items()
    }
    live_lat.sort()
    n_frames = len(names) * steps
    out = {
        "corpus_live_p50_ms": round(st.median(live_lat), 3),
        "corpus_live_frames": len(live_lat),
        "corpus_live_sparse_misses": stats.get("lsd_sparse_misses"),
        "corpus_live_h2d_bytes_per_frame": round(
            stats.get("h2d_bytes", 0) / max(1, n_frames)
        ),
        # Map switch = unrelated frame = the delta chain reseeds with a full
        # upload of the packed ROIs; at ~60 MB/s measured H2D this is link
        # bandwidth, not pipeline (the decomposition the README carries).
        "map_switch_p50_ms": round(st.median(switch_lat), 3),
        "map_switch_full_uploads": stats.get("full_uploads"),
    }
    if switch_stages:
        out["map_switch_stage_p50_ms"] = {
            k: round(st.median(v), 2) for k, v in switch_stages.items()
        }
    if switch_h2d:
        out["map_switch_h2d_bytes"] = int(st.median(switch_h2d))
        # Attribution: expected pure-link time for the re-upload at the
        # independently measured H2D bandwidth (probed below with a
        # same-sized buffer through the identical call-time-transfer path).
        try:
            bw = measure_h2d_bandwidth(int(st.median(switch_h2d)))
            out["h2d_mb_per_s"] = round(bw / 1e6, 1)
            out["map_switch_link_ms_est"] = round(
                st.median(switch_h2d) / bw * 1000.0, 1
            )
        except Exception as e:  # pragma: no cover - relay hiccup
            print(f"h2d bandwidth probe failed: {e}", file=sys.stderr)
    return out


def measure_h2d_bandwidth(nbytes: int, iters: int = 4) -> float:
    """Bytes/s through the SAME path a full upload takes: host buffer passed
    to a jitted program at call time (one relay exchange carries the bytes),
    then a 1-element materialize to bound completion. Subtracts the no-op
    roundtrip floor so the estimate is marginal link bandwidth, not floor."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(x):
        return x[:1] + 1

    floor_t: list[float] = []
    xfer_t: list[float] = []
    tiny = np.zeros(8, np.uint8)
    for i in range(iters):
        buf = np.random.randint(0, 255, nbytes, np.uint8)  # defeat dedup
        t0 = time.perf_counter()
        np.asarray(probe(tiny))
        t1 = time.perf_counter()
        np.asarray(probe(buf))
        t2 = time.perf_counter()
        if i:  # first pair pays the two bucket compiles
            floor_t.append(t1 - t0)
            xfer_t.append(t2 - t1)
    import statistics as st

    marginal = max(1e-3, st.median(xfer_t) - st.median(floor_t))
    return nbytes / marginal


def measure_relay_floor(iters: int = 24) -> float:
    """p50 of the MINIMAL dispatch->fetch roundtrip: an 8-int add on a
    device-resident array, result fetched with np.asarray. No payload, no
    pipeline — this is the link's intrinsic first-byte latency, the hard
    floor under any synchronous per-frame number from this process. On a
    PCIe-local TPU host the same probe measures ~0.2-0.5 ms; sync e2e minus
    this floor is the portable pipeline cost."""
    import statistics as st

    import jax

    x = jax.device_put(np.arange(8, dtype=np.int32))
    f = jax.jit(lambda a, s: a + s)
    np.asarray(f(x, np.int32(0)))  # compile + warm
    lats = []
    for i in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(x, np.int32(i + 1)))  # distinct arg: no result reuse
        lats.append((time.perf_counter() - t0) * 1000.0)
    return st.median(lats)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k", choices=["4k", "1440p", "1080p"])
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--mode", default="full",
        choices=["full", "latency", "batch", "stream", "worker", "corpus"],
    )
    # B=16 default: with the lazy chain barrier + rolling in-place pack the
    # per-batch relay fetch floor amortizes over 2x the frames and 4K B=16
    # beats B=8 in an interleaved same-process A/B (pooled 6.22 vs
    # 7.47 ms/frame, B=16 won all 4 ABBA rounds — tools/ab_batch_barrier.py
    # BATCH knob, r5). Round-4's "B=16 doesn't help at 4K" predates both.
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ocr", default="smhocr", choices=["smhocr", "tesseract"],
                    help="tesseract = the ctypes binding (gray band transport)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace of the measured section "
                         "(view with tensorboard / xprof)")
    args = ap.parse_args()

    w, h = {"4k": (3840, 2160), "1440p": (2560, 1440), "1080p": (1920, 1080)}[args.res]
    iters = 10 if args.quick else args.iters
    reps = 2 if args.quick else args.reps

    if args.mode == "corpus":
        cout = measure_corpus(args.res, 2 if args.quick else 4)
        print(json.dumps({
            "metric": f"{args.res}_real_corpus_p50_latency",
            "value": cout["corpus_p50_ms"], "unit": "ms",
            "vs_baseline": round(8.0 / cout["corpus_p50_ms"], 4),
            **cout,
        }))
        return
    if args.mode == "worker":
        wout = measure_worker(w, h, max(6, iters // 4))
        print(json.dumps({
            "metric": f"{args.res}_worker_e2e_p50_latency",
            "value": wout["worker_e2e_p50_ms"], "unit": "ms",
            "vs_baseline": round(8.0 / wout["worker_e2e_p50_ms"], 4),
            **wout,
        }))
        return
    if args.mode == "batch":
        per_frame_ms, bstats = measure_batched(w, h, max(4, iters // 2), batch=args.batch)
        print(json.dumps({
            "metric": f"{args.res}_batched_throughput_per_frame",
            "value": round(per_frame_ms, 3), "unit": "ms",
            "vs_baseline": round(8.0 / per_frame_ms, 4),
            "fps_per_chip": round(1000.0 / per_frame_ms, 2), "batch": args.batch,
            "delta_batches": bstats.get("delta_batches"),
            "h2d_bytes_per_frame": bstats.get("h2d_bytes_per_frame"),
            "stage_ms": {
                k[2:-3]: round(bstats[k], 1)
                for k in sorted(bstats)
                if k.startswith("t_") and k.endswith("_ms")
            },
            "lat_ms": bstats.get("lat_ms"),
        }))
        return
    if args.mode == "stream":
        fps = measure_pipelined_fps(w, h, 5.0 if args.quick else 10.0)
        per_frame_ms = 1000.0 / fps if fps > 0 else float("inf")
        print(json.dumps({
            "metric": f"{args.res}_pipelined_stream_throughput",
            "value": round(per_frame_ms, 3), "unit": "ms",
            "vs_baseline": round(8.0 / per_frame_ms, 4),
            "fps_per_chip": round(fps, 2),
        }))
        return

    from smh_tpu.ops import pipeline as ops_pipeline
    from smh_tpu.squadex.capture import Frame

    # Worker deployment shape FIRST: the worker process owns the device
    # client, and it must not contend with this process's own jax client
    # (spawn, measure across the socket, close — THEN init jax here).
    worker_metrics: dict = {}
    if args.mode == "full":
        try:
            worker_metrics = measure_worker(w, h, 6 if args.quick else 12)
        except Exception as e:  # the in-process metrics must still record
            print(f"worker measurement failed: {e}", file=sys.stderr)
            worker_metrics = {"worker_error": str(e)[:600]}

    # Client attach, timed APART from the warmup compiles: establishing this
    # process's device session through the tunnel costs anywhere from ~0.1 s
    # to 200+ s (measured: jax.devices() 0.09-10.2 s, first device_put
    # 0.58-71.6 s across two runs minutes apart — tools/probe_cold_start.py).
    # Folding that variance into warmup_s[0] made the cold start look like a
    # compile problem (round-4's 262 s); it is mostly session establishment,
    # which a PCIe-local TPU host pays in milliseconds. warmup_s below now
    # measures what the FRAMEWORK owes: the jit bucket compiles.
    t0 = time.perf_counter()
    import jax

    jax.devices()
    np.asarray(jax.device_put(np.zeros(8, np.uint8)))
    client_attach_s = round(time.perf_counter() - t0, 1)
    print(f"client attach: {client_attach_s}s", file=sys.stderr, flush=True)

    state = build_state(ocr=args.ocr)
    frames = [Frame(f, dpi=96) for f in make_bench_frames(w, h)]

    # Warmup: compile all buckets (fused pass at the rungs the adaptive
    # window will visit + red gate + ray march). First compile through a
    # remote compile service can take minutes; progress goes to stderr so a
    # watching driver knows the bench is alive.
    warmup_s = []
    for i in range(4):
        t0 = time.perf_counter()
        res = state.process(frames[i % len(frames)])
        warmup_s.append(round(time.perf_counter() - t0, 1))
        print(f"warmup {i}: {warmup_s[-1]}s", file=sys.stderr, flush=True)
    assert res is not None and len(res.markers) >= 1, "bench frame must detect"

    if args.profile:
        import contextlib

        import jax

        try:
            profile_cm = jax.profiler.trace(args.profile)
        except Exception as e:  # tracing may be unsupported on some relays
            print(f"profiler unavailable: {e}", file=sys.stderr)
            profile_cm = contextlib.nullcontext()
    else:
        import contextlib

        profile_cm = contextlib.nullcontext()

    backend = state.delegate.backend
    stats0 = dict(getattr(backend, "stats", {}))
    with profile_cm:
        p50, p90, rep_p50s = measure_process_p50(state, frames, iters, reps)
    stats = dict(getattr(backend, "stats", {}))
    measured = {k: stats[k] - stats0.get(k, 0) for k in stats}

    # Steady-state critical-path payload for the flags/window just used.
    from smh_tpu import consts as C

    g = C.map_geometry(w, h)
    with_ocr, with_quiet, _, crop_h, crop_w, _, inline, band = backend._dispatch_flags[:8]
    sparse = (
        backend._dispatch_flags[9] if len(backend._dispatch_flags) > 9 else None
    )
    layout = ops_pipeline.hostpack_layout(
        g.map_h, g.map_w, with_ocr=with_ocr, with_quiet=with_quiet,
        crop_h=crop_h, crop_w=crop_w, scales_inline=inline, scales_band=band,
        sparse_budget=sparse,
    )
    hostpack_bytes = layout["__total__"]
    scalespack_bytes = ops_pipeline.scalespack_layout(g.map_h, g.map_w)["__total__"]

    if hasattr(backend, "rois_dev"):
        dev_p50, devfetch_p50 = measure_device(backend, max(10, iters // 2))
    else:  # numpy fallback backend: no device decomposition to measure
        dev_p50 = devfetch_p50 = float("nan")
    ratio = res.meters_to_px_ratio
    markers_detected = len(res.markers)
    corpus_live: dict = {}
    if args.mode == "full":
        try:  # real-content numbers ride the artifact of record
            corpus_live = measure_corpus_live(state, w, h)
        except Exception as e:
            print(f"corpus-live measurement failed: {e}", file=sys.stderr)
            corpus_live = {"corpus_live_error": str(e)[:300]}
    state.close()

    batched_alt: dict = {}
    if args.mode == "latency":
        markers_p50 = None
        fps_pipelined = None
        batched_ms = None
    else:
        astate = build_state(scales_async=True, ocr=args.ocr)
        for i in range(2):
            astate.process(frames[i])
        amed, _, _ = measure_process_p50(astate, frames, iters, max(1, reps - 1))
        markers_p50 = amed
        astate.close()
        fps_pipelined = measure_pipelined_fps(w, h, 4.0 if args.quick else 8.0)
        # 14 batches in full mode: the relay stalls single exchanges for
        # 10-20 s at random (~1-3 per run) and drifts through multi-second
        # slow bursts; a median over 6 could tip if a run catches several,
        # over 14 it stays the steady state (each extra batch costs
        # ~50-400 ms — negligible against the run).
        batched_ms, bstats_full = measure_batched(w, h, 3 if args.quick else 14, batch=args.batch)
        # Secondary batched config for the artifact of record: 1080p B=16
        # amortizes the per-batch relay fetch floor to ~2 ms/frame — the
        # identified sub-8 ms/frame candidate (ROADMAP r5 item 0). Costs
        # two extra bucket compiles; skipped in quick mode and when the
        # bench already runs at 1080p.
        if not args.quick and (w, h) != (1920, 1080):
            try:
                alt_ms, alt_stats = measure_batched(1920, 1080, 14, batch=16)
                batched_alt = {
                    "batched_1080p_b16_ms_per_frame": round(alt_ms, 3),
                    "fps_batched_1080p_b16": round(1000.0 / alt_ms, 2),
                    "batched_1080p_b16_stalled": alt_stats.get("stalled_batches"),
                }
            except Exception as e:
                print(f"1080p B=16 batch failed: {e}", file=sys.stderr)

    out = {
        "metric": f"{args.res}_frame_to_markers_scales_p50_latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(8.0 / p50, 4),
        "p90_ms": round(p90, 3),
        "rep_p50s_ms": [round(v, 2) for v in rep_p50s],
        "fps_per_chip": round(1000.0 / p50, 2),
        "device_p50_ms": round(dev_p50, 3),
        "devfetch_p50_ms": round(devfetch_p50, 3),
        "hostpack_bytes": hostpack_bytes,
        "scalespack_bytes": scalespack_bytes,
        "lsd_window_misses": stats.get("lsd_window_misses"),
        "lsd_sparse_misses": stats.get("lsd_sparse_misses"),
        "sparse_budget_words": sparse,
        "scales_band_misses": stats.get("scales_band_misses"),
        "scalespack_fetches": stats.get("scalespack_fetches"),
        "frames_measured": stats.get("frames"),
        "delta_frames": measured.get("delta_frames"),
        "full_uploads": measured.get("full_uploads"),
        "h2d_bytes_per_frame": (
            round(measured["h2d_bytes"] / max(1, measured.get("frames", 0)))
            if measured.get("h2d_bytes") is not None
            else None
        ),
        "iters": iters,
        "reps": reps,
        "markers_detected": markers_detected,
        "meters_to_px_ratio": ratio,
    }
    if markers_p50 is not None:
        out["markers_async_p50_ms"] = round(markers_p50, 3)
        out["fps_pipelined"] = round(fps_pipelined, 2)
        out["batched_ms_per_frame"] = round(batched_ms, 3)
        out["fps_batched"] = round(1000.0 / batched_ms, 2)
        out["batched_stalled_batches"] = bstats_full.get("stalled_batches")
        out.update(batched_alt)
    out.update(worker_metrics)
    out.update(corpus_live)
    # The sync p50 ("value") is RELAY-FLOORED: one frame's hostpack lands
    # ~35-45 ms after its dispatch from any client-side process (measured,
    # docs/DESIGN.md §3 round-4 probes) — the production shapes are the
    # pipelined live loop, batch mode and the worker, whose numbers ride in
    # this same JSON. On a PCIe-local TPU host the identical code path's
    # fetch completes in ~10 us and sync e2e collapses to device + host.
    # relay_floor_p50_ms RECORDS that floor in the same artifact: the
    # minimal dispatch->fetch roundtrip (8 ints, no pipeline). value minus
    # floor is the pipeline's own synchronous cost — the portable number.
    try:
        floor = measure_relay_floor()
        out["relay_floor_p50_ms"] = round(floor, 3)
        out["sync_minus_floor_ms"] = round(p50 - floor, 3)
    except Exception as e:  # pragma: no cover - relay hiccup
        print(f"relay floor probe failed: {e}", file=sys.stderr)
    out["sync_floor_note"] = (
        "sync p50 is bounded by the relay's ~35-45 ms background fetch "
        "completion (relay_floor_p50_ms = the no-op dispatch->fetch p50 "
        "from this run; sync_minus_floor_ms = the pipeline's own cost); "
        "see fps_pipelined / batched_ms_per_frame / worker_*"
    )
    # Cold-start accounting: per-entry-point jit bucket counts for THIS
    # process (each bucket = one compile on a cold cache) + the observed
    # warmup wall times. The round-3 cold start was 980 s; the census makes
    # ladder growth a visible number instead of a mystery stall.
    out["jit_traces"] = ops_pipeline.trace_census()
    out["client_attach_s"] = client_attach_s
    out["warmup_s"] = warmup_s
    print(json.dumps(out))


if __name__ == "__main__":
    main()
