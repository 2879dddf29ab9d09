"""Regression tests for review findings (second pass)."""

import struct
import time

import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.ocr import FakeOcrEngine, OcrResult
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import Frame, StaticSource
from smh_tpu.vision.pipeline import VisionState


def test_scales_cache_invalidated_by_bar_change():
    """The scale BARS are black (not kept by the OCR preprocess), so two
    frames can share an identical OCR image while their bars differ — the
    ratio cache must key on the binarize content too."""
    ocr = FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)])
    settings = Settings(path=None)
    settings.set("hardware_acceleration", True)
    state = VisionState(settings=settings, ocr_engine=ocr)

    f_narrow = testing.make_frame(1280, 720, marker_lines=[((100, 100), (420, 300))],
                                  scale_bars=[(60, 200, 120, 1)])
    f_wide = testing.make_frame(1280, 720, marker_lines=[((100, 100), (420, 300))],
                                scale_bars=[(60, 200, 100, 1)])

    r1 = state.process(Frame(f_narrow, 96))
    r2 = state.process(Frame(f_wide, 96))
    state.close()

    assert r1.meters_to_px_ratio == pytest.approx(300 / 118)
    assert r2.meters_to_px_ratio == pytest.approx(300 / 98)  # NOT the cached 300/118

    # And the OCR images really were identical (the premise of the test).
    from smh_tpu.vision.reference import ReferenceBackend

    be = ReferenceBackend()
    be.load_frame(f_narrow)
    be.crop_to_map(True)
    a = be.ocr_preprocess().copy()
    be.load_frame(f_wide)
    be.crop_to_map(True)
    b = be.ocr_preprocess()
    assert (a == b).all()


def test_interactions_processed_without_new_frames():
    """Static source: after the single frame is processed, no further
    updates fire — interactions must still be handled via the server's
    on_interaction wake (web/src/ws.rs:60-74 semantics)."""
    websockets = pytest.importorskip("websockets")
    import asyncio

    from smh_tpu.app import App

    settings = Settings(path=None)
    settings.set("hardware_acceleration", False)
    app = App(
        StaticSource(testing.make_frame(1280, 720, marker_lines=[((100, 100), (420, 300))])),
        settings=settings,
        port=18778,
        ocr_engine=FakeOcrEngine([]),
    )
    app.web.ws_port = 18779
    app.start()
    try:
        # Wait until the single frame has been processed (updates stop after).
        deadline = time.time() + 30
        while app._last_results is None and time.time() < deadline:
            time.sleep(0.05)
        assert app._last_results is not None
        time.sleep(0.3)  # static source: no further frames from here on

        async def client():
            async with websockets.connect("ws://127.0.0.1:18779", max_size=None) as ws:
                await ws.send(struct.pack("<Hffff", 1, 1.0, 2.0, 3.0, 4.0))
                deadline = time.time() + 10
                while time.time() < deadline:
                    data = await asyncio.wait_for(ws.recv(), timeout=10)
                    if struct.unpack_from("<H", data, 0)[0] == 2 and data[2] == 1:
                        if struct.unpack_from("<I", data, 3)[0] == 1:
                            return True
                return False

        assert asyncio.run(client())
        assert app.custom_markers == [((1.0, 2.0), (3.0, 4.0))]
    finally:
        app.stop()


def test_backend_flag_does_not_persist(tmp_path):
    from smh_tpu.app import main

    path = tmp_path / "settings.json"
    path.write_text('{"hardware_acceleration": true}')
    s = Settings(path=str(path))
    s.set("hardware_acceleration", False, save=False)
    assert s.hardware_acceleration() is False
    # On-disk value untouched by the transient set.
    s2 = Settings(path=str(path))
    assert s2.hardware_acceleration() is True
