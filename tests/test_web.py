import struct
import threading
import time

import numpy as np
import pytest

from smh_tpu.geometry import Rect
from smh_tpu.squadex.heightmaps import Heightmap
from smh_tpu.web import protocol


def test_encode_map_layout():
    img = np.zeros((2, 3, 4), dtype=np.uint8)
    img[0, 0] = (1, 2, 3, 4)
    data = protocol.encode_map(img)
    assert struct.unpack_from("<H", data, 0)[0] == 1
    assert struct.unpack_from("<II", data, 2) == (3, 2)
    assert data[10:14] == bytes([1, 2, 3, 4])
    assert len(data) == 10 + 2 * 3 * 4


def test_encode_markers_layout():
    data = protocol.encode_markers([((1.0, 2.0), (3.0, 4.0))], custom=True)
    assert struct.unpack_from("<H", data, 0)[0] == 2
    assert data[2] == 1
    assert struct.unpack_from("<I", data, 3)[0] == 1
    assert struct.unpack_from("<ffff", data, 7) == (1.0, 2.0, 3.0, 4.0)
    assert len(data) == 2 + 1 + 4 + 16


def test_encode_update_state_layout():
    data = protocol.encode_update_state(2.5, Rect(left=10, top=30, right=20, bottom=40))
    assert struct.unpack_from("<H", data, 0)[0] == 3
    assert struct.unpack_from("<d", data, 2)[0] == 2.5
    assert data[10] == 1
    # order on the wire: left, right, top, bottom (web/src/lib.rs:166-172)
    assert struct.unpack_from("<IIII", data, 11) == (10, 20, 30, 40)
    # None ratio encodes as 0.0, missing minimap as flag 0
    data = protocol.encode_update_state(None, None)
    assert struct.unpack_from("<d", data, 2)[0] == 0.0
    assert data[10] == 0 and len(data) == 11


def test_encode_heightmap_layout():
    hm = Heightmap(
        width=2, height=2, bounds=((-5, -6), (7, 8)), scale=(1.0, 2.0, 3.0),
        data=np.array([[1, 2], [3, 4]], dtype=np.uint16),
    )
    data = protocol.encode_heightmap(hm)
    assert struct.unpack_from("<H", data, 0)[0] == 4
    assert data[2] == 1 and data[3] == 0  # flag + alignment pad
    assert struct.unpack_from("<II", data, 4) == (2, 2)
    assert struct.unpack_from("<ii", data, 12) == (-5, -6)
    assert struct.unpack_from("<f", data, 20)[0] == 3.0
    assert np.frombuffer(data[24:], dtype="<u2").tolist() == [1, 2, 3, 4]
    # u16 payload starts at even offset (the JS Uint16Array alignment hack)
    assert (len(data) - 8) % 2 == 0 and 24 % 2 == 0
    assert protocol.encode_heightmap(None) == struct.pack("<HB", 4, 0)


def test_decode_interactions():
    add = struct.pack("<Hffff", 1, 1.0, 2.0, 3.0, 4.0)
    m = protocol.decode_interaction(add)
    assert isinstance(m, protocol.AddCustomMarker)
    assert m.p0 == (1.0, 2.0) and m.p1 == (3.0, 4.0)

    delete = struct.pack("<HI", 2, 7)
    m = protocol.decode_interaction(delete)
    assert isinstance(m, protocol.DeleteCustomMarker) and m.index == 7

    assert protocol.decode_interaction(b"") is None
    assert protocol.decode_interaction(struct.pack("<H", 9)) is None
    assert protocol.decode_interaction(struct.pack("<Hf", 1, 1.0)) is None


def test_server_roundtrip():
    """End-to-end: server broadcast -> websocket client -> interaction back."""
    websockets = pytest.importorskip("websockets")
    import asyncio

    from smh_tpu.web.server import WebServer

    server = WebServer(port=18765, ws_port=18766, host="127.0.0.1").start()
    try:
        server.send_map(np.zeros((4, 6, 4), dtype=np.uint8))
        server.send_markers([((1.0, 2.0), (3.0, 4.0))], custom=False)
        server.send_update_state(1.5, None)

        received = []

        async def client():
            async with websockets.connect("ws://127.0.0.1:18766") as ws:
                # snapshot: map, update_state, markers, fit (4 events)
                for _ in range(4):
                    received.append(await asyncio.wait_for(ws.recv(), timeout=5))
                # send an interaction
                await ws.send(struct.pack("<Hffff", 1, 5.0, 6.0, 7.0, 8.0))
                # wait for a live broadcast
                await asyncio.sleep(0.2)

        asyncio.run(client())

        ids = sorted(struct.unpack_from("<H", r, 0)[0] for r in received)
        assert ids == [1, 2, 3, 5]

        deadline = time.time() + 5
        inter = None
        while inter is None and time.time() < deadline:
            inter = server.recv()
            time.sleep(0.01)
        assert isinstance(inter, protocol.AddCustomMarker)
        assert inter.p0 == (5.0, 6.0)
    finally:
        server.stop()


def test_http_page_serves_client():
    import urllib.request

    from smh_tpu.web.server import WebServer

    server = WebServer(port=18767, ws_port=18768, host="127.0.0.1").start()
    try:
        html = urllib.request.urlopen("http://127.0.0.1:18767/", timeout=5).read().decode()
        assert "18768" in html  # {{ WEBSOCKET_PORT }} substituted
        assert "WebSocket" in html
    finally:
        server.stop()
