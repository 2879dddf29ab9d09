import struct
import time

import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.app import App
from smh_tpu.ocr import FakeOcrEngine, OcrResult
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import StaticSource


@pytest.fixture
def app():
    frame = testing.make_frame(
        1280, 720,
        marker_lines=[((100, 100), (420, 300))],
        scale_bars=[(60, 200, 120, 1)],
    )
    settings = Settings(path=None)
    settings.set("hardware_acceleration", False)
    a = App(
        StaticSource(frame, dpi=96),
        settings=settings,
        port=18770,
        ocr_engine=FakeOcrEngine([OcrResult("300m", 91.0, 100, 180, 140, 195)]),
    )
    a.web.ws_port = 18771
    a.start()
    yield a
    a.stop()


def test_app_end_to_end(app):
    """Frame flows capture -> vision -> web; client sees map + markers."""
    websockets = pytest.importorskip("websockets")
    import asyncio

    deadline = time.time() + 30
    got = {}

    async def client():
        async with websockets.connect("ws://127.0.0.1:18771", max_size=None) as ws:
            while time.time() < deadline and not ({1, 2, 3} <= set(got)):
                data = await asyncio.wait_for(ws.recv(), timeout=20)
                eid = struct.unpack_from("<H", data, 0)[0]
                got[eid] = data

    asyncio.run(client())

    assert 1 in got and 2 in got and 3 in got
    w, h = struct.unpack_from("<II", got[1], 2)
    assert (w, h) == (657, 548)  # map ROI at 1280x720
    n_markers = struct.unpack_from("<I", got[2], 3)[0]
    assert n_markers == 1
    ratio = struct.unpack_from("<d", got[3], 2)[0]
    assert ratio == pytest.approx(300 / 118)


def test_app_custom_marker_roundtrip(app):
    websockets = pytest.importorskip("websockets")
    import asyncio

    async def client():
        async with websockets.connect("ws://127.0.0.1:18771", max_size=None) as ws:
            await ws.send(struct.pack("<Hffff", 1, 10.0, 20.0, 30.0, 40.0))
            deadline = time.time() + 30
            while time.time() < deadline:
                data = await asyncio.wait_for(ws.recv(), timeout=20)
                if struct.unpack_from("<H", data, 0)[0] == 2 and data[2] == 1:
                    n = struct.unpack_from("<I", data, 3)[0]
                    if n == 1:
                        return struct.unpack_from("<ffff", data, 7)
            return None

    coords = asyncio.run(client())
    assert coords == (10.0, 20.0, 30.0, 40.0)
    assert app.custom_markers == [((10.0, 20.0), (30.0, 40.0))]
