import numpy as np

from smh_tpu import testing
from smh_tpu.ocr import FakeOcrEngine
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import Frame
from smh_tpu.vision.pipeline import VisionState

import pytest

pytestmark = pytest.mark.slow  # jit-compile heavy (see pyproject markers)


def test_minimap_every_caches_bounds():
    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    state = VisionState(settings=settings, ocr_engine=FakeOcrEngine([]), minimap_every=5)

    frames = [
        Frame(testing.make_frame(1280, 720, marker_lines=[((100 + i, 100), (420 + i, 300))]))
        for i in range(3)
    ]
    r0 = state.process(frames[0])
    assert r0 is not None
    b0 = r0.minimap_bounds
    # Next frames inside the cadence window reuse the cached bounds and the
    # device fetch omits the quiet mask entirely.
    r1 = state.process(frames[1])
    assert r1.minimap_bounds == b0
    assert "quiet_bits" not in state.delegate.backend._host
    r2 = state.process(frames[2])
    assert r2.minimap_bounds == b0
    state.close()


def test_minimap_recomputed_on_resolution_change():
    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    state = VisionState(settings=settings, ocr_engine=FakeOcrEngine([]), minimap_every=100)

    r0 = state.process(Frame(testing.make_frame(1280, 720)))
    assert r0 is not None
    r1 = state.process(Frame(testing.make_frame(1024, 768)))
    assert r1 is not None  # resolution change forces a fresh minimap pass
    assert state._minimap_cache[0] == (1024, 768)
    state.close()
