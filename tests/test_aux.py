"""Auxiliary subsystems: pixel inspector, ring log, heightmap browser,
blackout fallback, settings persistence."""

import logging

import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.heightmaps import browser, ripper
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import BlackoutFallbackSource, Frame, StaticSource
from smh_tpu.utils.ringlog import RingLogHandler
from smh_tpu.vision.inspect import inspect_pixel


def test_pixel_inspector():
    r, g, b = testing.ALPHA_MARKER_RGB
    info = inspect_pixel(r, g, b)
    assert info.is_marker
    assert info.fireteams["alpha"].passed
    assert not info.fireteams["bravo"].passed
    assert info.min_sat_ok and info.s == 100 and info.v == 100

    info = inspect_pixel(255, 255, 255)
    assert not info.is_marker and not info.min_sat_ok


def test_ring_log_collapses_repeats():
    h = RingLogHandler(capacity=10)
    h.setFormatter(logging.Formatter("%(message)s"))
    logger = logging.getLogger("test.ring")
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
    try:
        for _ in range(5):
            logger.info("same message")
        logger.info("different")
        entries = h.entries()
        assert len(entries) == 2
        assert entries[0].count == 5
        assert "(x5)" in h.formatted()[0]
    finally:
        logger.removeHandler(h)


def test_ring_log_seq_and_errors():
    h = RingLogHandler(capacity=10)
    h.setFormatter(logging.Formatter("%(message)s"))
    logger = logging.getLogger("test.ring3")
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
    try:
        logger.info("a")
        s1 = h.seq
        logger.info("a")  # repeat bumps seq too (poll cursors see the count)
        assert h.seq == s1 + 1
        assert h.entries(since=s1)[0].count == 2
        assert h.errors == 0
        logger.error("boom")
        assert h.errors == 1
        assert h.entries(since=h.seq) == []
    finally:
        logger.removeHandler(h)


def test_collapsing_file_handler(tmp_path):
    """--dumplogs file sink rewrites '(xN)' repeat counts in place, like the
    reference (/root/reference/src/ui/logs.rs:58-144)."""
    from smh_tpu.utils.ringlog import CollapsingFileHandler

    path = tmp_path / "smh.log"
    h = CollapsingFileHandler(str(path))
    h.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
    logger = logging.getLogger("test.dump")
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
    try:
        for _ in range(3):
            logger.info("repeat me")
        logger.warning("then this")
        logger.warning("then this")
        logger.info("tail")
        lines = path.read_text().splitlines()
        assert lines == [
            "INFO repeat me (x3)",
            "WARNING then this (x2)",
            "INFO tail",
        ]
    finally:
        logger.removeHandler(h)
        h.close()


def test_ring_log_capacity():
    h = RingLogHandler(capacity=3)
    h.setFormatter(logging.Formatter("%(message)s"))
    logger = logging.getLogger("test.ring2")
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
    try:
        for i in range(10):
            logger.info("msg %d", i)
        assert len(h.entries()) == 3
        assert h.entries()[-1].message == "msg 9"
    finally:
        logger.removeHandler(h)


def stub_invoke(args, exe):
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "smh_tpu.heightmaps.stub_ripper", *args],
        capture_output=True, timeout=60,
    )
    return proc.stdout


def test_browser_cache_flow(tmp_path, monkeypatch):
    monkeypatch.setattr(ripper, "_invoke", stub_invoke)
    layer = "SquadGame/Content/Maps/Mutaha/Mutaha.umap"

    hm1 = browser.load_or_rip(layer, ["paks"], None, cache_dir=str(tmp_path))
    assert hm1 is not None
    cache_files = list(tmp_path.glob("*.smhhm"))
    assert len(cache_files) == 1

    # Cache hit: poison the ripper; must still load.
    monkeypatch.setattr(ripper, "_invoke", lambda *a, **k: (_ for _ in ()).throw(RuntimeError))
    hm2 = browser.load_or_rip(layer, ["paks"], None, cache_dir=str(tmp_path))
    assert hm2 is not None and (hm2.data == hm1.data).all()


def test_browser_export_and_preview(tmp_path, monkeypatch):
    monkeypatch.setattr(ripper, "_invoke", stub_invoke)
    hm = browser.load_or_rip(
        "SquadGame/Content/Maps/Narva/Narva_RAAS_v1.umap", ["paks"], None, cache_dir=str(tmp_path)
    )
    png = tmp_path / "out.png"
    browser.export_png(hm, str(png))
    from PIL import Image

    img = Image.open(png)
    assert img.size == (hm.width, hm.height)
    assert img.mode in ("I", "I;16")

    fc = browser.false_color(hm)
    assert fc.shape == (hm.height, hm.width, 3) and fc.dtype == np.uint8


def test_blackout_fallback():
    good = testing.make_frame(640, 360)
    black = np.zeros_like(good)

    class Scripted:
        def __init__(self, frames):
            self.frames = list(frames)
            self.i = 0

        def grab(self):
            f = self.frames[min(self.i, len(self.frames) - 1)]
            self.i += 1
            return Frame(f)

    primary = Scripted([good, black, good, good])
    src = BlackoutFallbackSource(primary, StaticSource(good), reprobe_every=2)

    assert src.grab().image is good  # healthy
    assert not src._blackout
    f = src.grab()  # primary went black -> fallback kicks in
    assert src._blackout and f is not None
    src.grab()  # fallback serving, probe counter ticking
    f = src.grab()  # re-probe finds primary healthy again
    assert not src._blackout


def test_settings_persistence(tmp_path):
    path = tmp_path / "settings.json"
    s = Settings(path=str(path))
    s.set("detect_markers", False)
    s.set("squad_pak_aes", "0xKEY")
    assert path.exists()

    s2 = Settings(path=str(path))
    assert s2.detect_markers() is False
    assert s2.squad_pak_aes() == "0xKEY"
    # paused never persists
    s2.set_paused(True)
    s3 = Settings(path=str(path))
    assert s3.paused() is False
