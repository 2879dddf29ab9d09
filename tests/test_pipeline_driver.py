import numpy as np
import pytest

from smh_tpu import consts as C, testing
from smh_tpu.ocr import FakeOcrEngine, OcrResult
from smh_tpu.settings import Settings
from smh_tpu.squadex import heightmaps
from smh_tpu.squadex.capture import Frame
from smh_tpu.vision.pipeline import VisionState, _parse_scales
from smh_tpu.vision.reference import DebugView


def make_state(ocr=None, hardware=False, debug_view=DebugView.NONE):
    s = Settings(path=None)
    s.set("hardware_acceleration", hardware)
    return VisionState(settings=s, ocr_engine=ocr, debug_view=debug_view)


def scale_frame():
    # Scale bar at BRQ (60, 200), width 120 -> drawn with end bars.
    return testing.make_frame(
        1280,
        720,
        marker_lines=[((100, 100), (420, 300))],
        scale_bars=[(60, 200, 120, 1)],
    )


def test_parse_scales():
    rs = [
        OcrResult("300m", 90.0, 100, 180, 140, 195),
        OcrResult("300m", 90.0, 300, 180, 340, 196),  # duplicate meters -> skipped
        OcrResult("150m", 85.0, 200, 180, 240, 193),
        OcrResult("junk", 10.0, 0, 0, 5, 5),
        OcrResult("0m", 10.0, 0, 0, 5, 5),  # zero -> skipped
        OcrResult("75m", 85.0, 260, 180, 280, 194),
        OcrResult("50m", 85.0, 260, 180, 280, 194),  # 4th -> capped at 3
    ]
    scales, start_y = _parse_scales(rs)
    assert start_y == 193
    assert [s for s, _ in scales] == [300, 150, 75]
    assert scales[0][1] == (120, 195)


def test_full_pipeline_with_scales():
    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    state = make_state(ocr=ocr)
    res = state.process(Frame(scale_frame(), dpi=96))
    assert res is not None
    assert len(res.markers) == 1
    # bar: left end 60, right end 180 -> left=61, right=179, width=118
    assert res.meters_to_px_ratio == pytest.approx(300 / 118)
    assert ocr.calls and ocr.calls[0][1] == 96
    assert res.map is not None and res.map.shape[2] == 4
    assert res.minimap_bounds is None or res.minimap_bounds.width() > 0
    state.close()


def test_pipeline_sleeping():
    state = make_state(ocr=FakeOcrEngine([]))
    res = state.process(Frame(testing.make_frame(1280, 720, with_button=False)))
    assert res is None
    state.close()


def test_heightmap_skips_scales():
    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    hm = heightmaps.Heightmap(
        width=2, height=2, bounds=((0, 0), (0, 0)), scale=(1, 1, 1),
        data=np.zeros((2, 2), dtype=np.uint16),
    )
    heightmaps.set_current(hm)
    try:
        state = make_state(ocr=ocr)
        res = state.process(Frame(scale_frame()))
        assert res is not None
        assert res.meters_to_px_ratio is None
        assert not ocr.calls  # OCR never invoked
        state.close()
    finally:
        heightmaps.set_current(None)


def test_detect_markers_off():
    state = make_state(ocr=FakeOcrEngine([]))
    state.settings.set("detect_markers", False)
    res = state.process(Frame(scale_frame()))
    assert res is not None and res.markers == []
    state.close()


def test_timeshares_recorded():
    from smh_tpu.vision.pipeline import DebugBox

    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    state = make_state(ocr=ocr)
    debug = DebugBox()
    state.process(Frame(scale_frame()), debug)
    stages = dict(debug.timeshares.stages)
    for key in ("load_frame", "crop_to_map", "find_minimap", "ocr", "find_marker_lines"):
        assert key in stages, key
    assert debug.timeshares.entire_frame is not None
    state.close()


def test_tpu_backend_through_driver():
    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    state = make_state(ocr=ocr, hardware=True)
    res = state.process(Frame(scale_frame()))
    assert res is not None
    assert state.delegate.backend.name == "tpu"
    assert len(res.markers) == 1
    assert res.meters_to_px_ratio == pytest.approx(300 / 118)
    state.close()


def test_debug_view_through_driver():
    state = make_state(ocr=FakeOcrEngine([]), hardware=True, debug_view=DebugView.LSD_INPUT)
    res = state.process(Frame(scale_frame()))
    assert res is not None and res.debug_view is not None
    assert res.debug_view.shape[2] == 4
    state.close()
