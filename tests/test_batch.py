import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.ocr import FakeOcrEngine, OcrResult
from smh_tpu.vision.batch import BatchPipeline


def test_batch_matches_single():
    frames = [
        testing.make_frame(1280, 720, marker_lines=[((100, 100), (420, 300))]),
        testing.make_frame(1280, 720, marker_lines=[((50, 400), (500, 380))]),
        testing.make_frame(1280, 720, with_button=False),  # sleeping
    ]
    bp = BatchPipeline(1280, 720, batch=4, ocr_engine=None)
    results = bp.process(frames)
    assert len(results) == 3
    assert not results[0].sleeping and len(results[0].markers) == 1
    assert not results[1].sleeping and len(results[1].markers) == 1
    assert results[2].sleeping

    # Same detections as the per-frame TPU backend.
    from smh_tpu.vision.tpu_backend import TpuBackend

    be = TpuBackend()
    be.load_frame(frames[0])
    assert be.crop_to_map(True) is not None
    single = be.find_marker_lines(15)
    assert len(single) == len(results[0].markers)
    for a, b in zip(single, results[0].markers):
        assert abs(a.p1.x - b.p1.x) < 1e-3 and abs(a.p1.y - b.p1.y) < 1e-3


def test_batch_with_scales():
    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    frames = [
        testing.make_frame(
            1280, 720, marker_lines=[((100, 100), (420, 300))], scale_bars=[(60, 200, 120, 1)]
        )
    ]
    bp = BatchPipeline(1280, 720, batch=2, ocr_engine=ocr)
    results = bp.process(frames)
    assert results[0].meters_to_px_ratio == pytest.approx(300 / 118)
