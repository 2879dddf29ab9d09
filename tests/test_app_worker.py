"""App in worker mode: capture -> shm ring -> worker process -> web pushes.

The regression this pins: a STATIC source publishes its frame exactly once
(capture dedup), and the worker spends its first ~minute warming up — the
feeder must retain the undelivered frame and retry, and the ui map (which
the worker emits AFTER the result event) must still reach web clients
(app pushes it from the on_map callback and backfills the retained results
for late connectors)."""

import asyncio
import contextlib
import socket

import pytest

pytestmark = pytest.mark.slow

websockets = pytest.importorskip("websockets")


def _free_port() -> int:
    with contextlib.closing(socket.socket()) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_worker_mode_app_serves_protocol_events():
    from smh_tpu import testing
    from smh_tpu.app import App
    from smh_tpu.ocr.smhocr import SmhOcrEngine
    from smh_tpu.settings import Settings
    from smh_tpu.squadex.capture import StaticSource

    frame = testing.make_frame(
        960, 540,
        marker_lines=[((40, 60), (300, 200))],
        scale_texts=[("300m", (30, 100))],
        scale_bars=[(30, 122, 60, 1)],
    )
    port = _free_port()
    app = App(
        StaticSource(frame, dpi=96),
        settings=Settings(path=None),
        port=port,
        ocr_engine=SmhOcrEngine(),
        worker=True,
    ).start()
    try:
        async def collect():
            events = {}
            deadline = asyncio.get_event_loop().time() + 240
            while asyncio.get_event_loop().time() < deadline:
                try:
                    async with websockets.connect(
                        f"ws://127.0.0.1:{port + 1}", max_size=None, open_timeout=5
                    ) as ws:
                        while asyncio.get_event_loop().time() < deadline:
                            try:
                                msg = await asyncio.wait_for(ws.recv(), timeout=10)
                            except asyncio.TimeoutError:
                                break
                            if isinstance(msg, bytes) and msg:
                                events.setdefault(msg[0], len(msg))
                            if {1, 2, 3} <= set(events):
                                return events
                except OSError:
                    await asyncio.sleep(1)
            return events

        events = asyncio.run(collect())
        # Map(1), Markers(2), UpdateState(3) — the client's render inputs.
        assert {1, 2, 3} <= set(events), events
        assert events[1] > 100_000  # a real RGBA map, not a stub
    finally:
        app.stop()
