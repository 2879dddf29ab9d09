"""Pipelined (double-buffered) streaming loop: same detections, two frames
in flight."""

import time

import pytest

from smh_tpu import testing
from smh_tpu.ocr import FakeOcrEngine, OcrResult
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import CaptureThread, Frame
from smh_tpu.vision.pipeline import VisionLoop, VisionState


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


@pytest.mark.parametrize("hardware", [True, False])
def test_pipelined_matches_sync(hardware):
    frames = make_frames()

    def collect(pipelined):
        settings = Settings(path=None)
        settings.set("hardware_acceleration", hardware)
        state = VisionState(
            settings=settings,
            ocr_engine=FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)]),
        )
        updates = []
        cap = CaptureThread(Cycle(frames), hz=120).start()
        loop = VisionLoop(
            state, cap, lambda r, d: updates.append(r), fps=120, pipelined=pipelined
        ).start()
        deadline = time.time() + 180  # generous: CPU jit compiles under parallel load
        while len(updates) < 6 and time.time() < deadline:
            time.sleep(0.05)
        loop.stop()
        cap.stop()
        state.close()
        return updates[:6]

    sync = collect(False)
    pipe = collect(True)
    assert len(sync) == len(pipe) == 6

    def summarize(u):
        return (
            len(u.markers),
            None if not u.markers else (round(u.markers[0].p0.x), round(u.markers[0].p0.y)),
            None if u.meters_to_px_ratio is None else round(u.meters_to_px_ratio, 6),
        )

    # Same frames produce the same per-frame detections in either mode
    # (ordering may differ by the 1-frame pipeline offset, so compare sets).
    assert {summarize(u) for u in sync if u} == {summarize(u) for u in pipe if u}


def test_pipelined_with_minimap_cadence():
    """Regression: alternating quiet-mask flags between in-flight frames must
    not corrupt hostpack parsing (adopt_job must restore dispatch flags)."""
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
