"""Full-render headless browser test — runs where a browser stack exists.

This image ships no JS engine or browser (no node, no chromium, no
playwright), so this module SKIPS here; the client math is still covered by
tests/test_web_client_math.py (source pins + Python twins), and a manual
render verification against a real WebView is recorded in PARITY.md. On any
host with `pip install playwright && playwright install chromium`, this test
runs the real client end-to-end: serve the app on a synthetic frame,
connect, and assert the map painted and a marker line + mil label rendered.
"""

import contextlib
import socket

import pytest

playwright_api = pytest.importorskip(
    "playwright.sync_api", reason="playwright not installed (no browser in image)"
)


def _free_port() -> int:
    with contextlib.closing(socket.socket()) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_client_renders_markers_and_mils():
    import math

    from smh_tpu import testing
    from smh_tpu.geometry import Line
    from smh_tpu.ocr.smhocr import SmhOcrEngine
    from smh_tpu.settings import Settings
    from smh_tpu.squadex import solutions
    from smh_tpu.squadex.capture import StaticSource
    from smh_tpu.app import App

    frame = testing.make_frame(
        1280, 720,
        marker_lines=[((120, 150), (400, 320))],
        scale_texts=[("300m", (40, 120))],
        scale_bars=[(40, 150, 80, 1)],
    )
    settings = Settings(path=None)
    settings.set("hardware_acceleration", False)  # numpy: no device needed
    port = _free_port()
    app = App(
        StaticSource(frame, dpi=96), settings=settings, port=port,
        ocr_engine=SmhOcrEngine(),
    ).start()
    try:
        with playwright_api.sync_playwright() as pw:
            browser = pw.chromium.launch()
            page = browser.new_page()
            page.goto(f"http://127.0.0.1:{port}/", timeout=30_000)
            # Map painted: the status line reports connected + a map arrived.
            page.wait_for_function(
                "() => window.S && S.mapW > 0 && S.cvMarkers.length >= 1",
                timeout=60_000,
            )
            got = page.evaluate("S.cvMarkers[0]")
            (x0, y0), (x1, y1) = got
            assert abs(x0 - 120) <= 3 and abs(y0 - 150) <= 3
            # The rendered mil label must agree with the server-side math.
            ratio = page.evaluate("S.ratio")
            assert ratio is not None
            sol = solutions.solve(
                Line.from_tuple(((x0, y0), (x1, y1))), meters_to_px_ratio=ratio
            )
            mils = page.evaluate(f"calcMils({sol.meters}, 0)")
            assert not math.isnan(sol.mil_fwd)
            assert abs(mils - sol.mil_fwd) < 1e-6
            browser.close()
    finally:
        app.stop()
