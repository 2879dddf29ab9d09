"""Pipelined (double-buffered) streaming loop: same detections, two frames
in flight."""

import time

import pytest

from smh_tpu import testing
from smh_tpu.ocr import FakeOcrEngine, OcrResult
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import CaptureThread, Frame
from smh_tpu.vision.pipeline import VisionLoop, VisionState

pytestmark = pytest.mark.slow  # jit-compile heavy (see pyproject markers)


class Cycle:
    def __init__(self, frames):
        self.frames = frames
        self.i = 0

    def grab(self):
        self.i += 1
        return Frame(self.frames[self.i % len(self.frames)], 96)


def make_frames():
    return [
        testing.make_frame(
            1280, 720,
            marker_lines=[((100 + 10 * i, 100), (420 + 10 * i, 300))],
            scale_bars=[(60, 200, 120, 1)],
        )
        for i in range(3)
    ]


def summarize(u):
    return (
        len(u.markers),
        None if not u.markers else (round(u.markers[0].p0.x), round(u.markers[0].p0.y)),
        None if u.meters_to_px_ratio is None else round(u.meters_to_px_ratio, 6),
    )


@pytest.mark.parametrize("hardware", [True, False])
def test_pipelined_matches_sync(hardware):
    """Every update a streaming loop publishes (sync or pipelined) must match
    the direct single-frame result for SOME input frame — a torn frame (two
    in-flight uploads seeing each other's pixels) produces a summary outside
    that truth set. Which frames each loop happens to process is
    scheduling-dependent (latest-wins mailbox under a fast capture), so
    coverage is asserted loosely and correctness exactly."""
    frames = make_frames()

    def make_state():
        settings = Settings(path=None)
        settings.set("hardware_acceleration", hardware)
        return VisionState(
            settings=settings,
            ocr_engine=FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)]),
        )

    # Ground truth: each frame processed alone, direct call, fresh state.
    truth_state = make_state()
    truths = set()
    for f in frames:
        r = truth_state.process(Frame(f, 96))
        assert r is not None
        truths.add(summarize(r))
    truth_state.close()
    assert len(truths) == 3  # three distinct marker positions

    def collect(pipelined, threaded=False):
        state = make_state()
        updates = []
        cap = CaptureThread(Cycle(frames), hz=120).start()
        loop = VisionLoop(
            state, cap, lambda r, d: updates.append(r), fps=120,
            pipelined=pipelined, threaded_submit=threaded,
        ).start()
        deadline = time.time() + 180  # generous: CPU jit compiles under parallel load
        while len(updates) < 6 and time.time() < deadline:
            time.sleep(0.05)
        loop.stop()
        cap.stop()
        state.close()
        return updates[:6]

    # threaded=True exercises the two-thread submit/consume discipline (the
    # snapshot views make it sound; on the numpy backend it must fall back
    # to the single-threaded loop and still deliver).
    for pipelined, threaded in ((False, False), (True, False), (True, True)):
        got = collect(pipelined, threaded)
        assert len(got) == 6
        seen = {summarize(u) for u in got if u}
        assert seen <= truths, f"pipelined={pipelined},threaded={threaded}: torn/wrong detections"
        assert len(seen) >= 2, f"pipelined={pipelined},threaded={threaded}: suspiciously low coverage"


def test_pipelined_with_minimap_cadence():
    """Regression: alternating quiet-mask flags between in-flight frames must
    not corrupt hostpack parsing (each snapshot view carries the dispatch
    flags its hostpack was packed with)."""
    frames = make_frames()
    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    state = VisionState(
        settings=settings,
        ocr_engine=FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)]),
        minimap_every=2,  # quiet flag flips between consecutive frames
    )
    updates = []
    cap = CaptureThread(Cycle(frames), hz=120).start()
    loop = VisionLoop(state, cap, lambda r, d: updates.append(r), fps=120, pipelined=True).start()
    deadline = time.time() + 150  # generous: CPU jit compiles under load
    while len(updates) < 8 and time.time() < deadline:
        time.sleep(0.05)
    loop.stop()
    cap.stop()
    state.close()
    assert len(updates) >= 8
    assert state.delegate.backend.name == "tpu"  # no silent numpy fallback
    for u in updates:
        assert u is not None and len(u.markers) == 1
        assert u.meters_to_px_ratio is not None
