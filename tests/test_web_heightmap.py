"""Heightmap selection propagates to web clients (byte-level decode)."""

import struct
import time

import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.app import App
from smh_tpu.ocr import FakeOcrEngine
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import StaticSource
from smh_tpu.squadex.heightmaps import Heightmap


def test_heightmap_event_reaches_client():
    websockets = pytest.importorskip("websockets")
    import asyncio

    settings = Settings(path=None)
    settings.set("hardware_acceleration", False)
    app = App(
        StaticSource(testing.make_frame(1280, 720)),
        settings=settings,
        port=18774,
        ocr_engine=FakeOcrEngine([]),
    )
    app.web.ws_port = 18775
    app.start()
    try:
        hm = Heightmap(
            width=4, height=3, bounds=((-7, -8), (9, 10)), scale=(1.0, 2.0, 321.0),
            data=np.arange(12, dtype=np.uint16).reshape(3, 4),
        )
        app.select_heightmap(hm)

        async def client():
            async with websockets.connect("ws://127.0.0.1:18775", max_size=None) as ws:
                deadline = time.time() + 15
                while time.time() < deadline:
                    data = await asyncio.wait_for(ws.recv(), timeout=10)
                    if struct.unpack_from("<H", data, 0)[0] == 4:
                        return data
            return None

        data = asyncio.run(client())
        assert data is not None
        assert data[2] == 1  # present flag
        w, h = struct.unpack_from("<II", data, 4)
        assert (w, h) == (4, 3)
        assert struct.unpack_from("<ii", data, 12) == (-7, -8)
        assert struct.unpack_from("<f", data, 20)[0] == pytest.approx(321.0)
        vals = np.frombuffer(data[24:], dtype="<u2")
        assert vals.tolist() == list(range(12))

        # Selecting a heightmap also gates the scales branch.
        from smh_tpu.squadex import heightmaps as hms

        assert hms.is_set()
    finally:
        from smh_tpu.squadex import heightmaps as hms

        hms.set_current(None)
        app.stop()
