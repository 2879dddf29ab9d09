"""BASELINE.json config: "Heightmap mode: ripped heightmap + detected lines
-> distance/altitude/milliradian calc" — end to end through the pipeline."""

import math
import sys

import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.geometry import Line, Point
from smh_tpu.heightmaps import ripper
from smh_tpu.ocr import FakeOcrEngine
from smh_tpu.settings import Settings
from smh_tpu.squadex import heightmaps as hms, solutions
from smh_tpu.squadex.capture import Frame
from smh_tpu.vision.pipeline import VisionState


def stub_invoke(args, exe):
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "smh_tpu.heightmaps.stub_ripper", *args],
        capture_output=True, timeout=60,
    )
    return proc.stdout


@pytest.mark.parametrize("hardware", [False, True])
def test_heightmap_mode_end_to_end(monkeypatch, hardware):
    monkeypatch.setattr(ripper, "_invoke", stub_invoke)

    # 1. Rip a heightmap through the subprocess contract.
    hm = ripper.get_heightmap(["paks"], None, "SquadGame/Content/Maps/Mutaha/Mutaha.umap")
    assert hm is not None
    hms.set_current(hm)
    try:
        # 2. Run the pipeline: a marker line on a synthetic frame; the scales
        #    branch must be skipped entirely (heightmap supplies distances).
        ocr = FakeOcrEngine([])
        settings = Settings(path=None)
        settings.set("hardware_acceleration", hardware)
        state = VisionState(settings=settings, ocr_engine=ocr)
        frame = testing.make_frame(1280, 720, marker_lines=[((100, 100), (420, 300))])
        res = state.process(Frame(frame))
        state.close()

        assert res is not None and len(res.markers) == 1
        assert res.meters_to_px_ratio is None
        assert not ocr.calls  # OCR engine never touched

        # 3. Solve: line + minimap bounds + heightmap -> meters/alt/mils.
        # The uniform synthetic background makes minimap detection degenerate
        # (everything is "quiet"), so project through the full map bbox; the
        # minimap-detection quality itself is covered by the golden tests.
        from smh_tpu import consts as C
        from smh_tpu.geometry import Rect

        g = C.map_geometry(1280, 720)
        bounds = Rect(left=0, top=0, right=g.map_w, bottom=g.map_h)

        sol = solutions.solve(
            res.markers[0],
            minimap_bounds=bounds,
            heightmap=hm,
            fit_to_minimap=True,
        )
        assert sol is not None
        assert sol.meters > 0
        assert sol.alt_delta is not None
        assert not math.isnan(sol.bearing_fwd)
        # mils are either a valid high-angle solution or NaN (out of range)
        if not math.isnan(sol.mil_fwd):
            assert 700 < sol.mil_fwd < 1600
    finally:
        hms.set_current(None)


def test_4k_tpu_parity():
    """BASELINE config: full 4K frame, fused pass outputs diffed vs oracle."""
    from smh_tpu.vision.reference import ReferenceBackend
    from smh_tpu.vision.tpu_backend import TpuBackend

    frame = testing.make_frame(3840, 2160, marker_lines=[((200, 300), (900, 800))])

    ref = ReferenceBackend()
    ref.load_frame(frame)
    assert ref.crop_to_map(grayscale=True) is not None
    ref.isolate_map_markers()
    ref.mask_marker_lines()
    lines_ref = ref.find_marker_lines(15)

    tpu = TpuBackend()
    tpu.load_frame(frame)
    assert tpu.crop_to_map(grayscale=True) is not None
    lines_tpu = tpu.find_marker_lines(15)

    assert len(lines_ref) == len(lines_tpu) == 1
    for lr, lt in zip(lines_ref, lines_tpu):
        assert abs(lr.p1.x - lt.p1.x) <= 1.5 and abs(lr.p1.y - lt.p1.y) <= 1.5
