"""Round-2 capture sources: video files, live screen seam, X11 conversion."""

import numpy as np
import pytest

from smh_tpu import testing
from smh_tpu.squadex import capture


@pytest.fixture(scope="module")
def demo_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vid") / "clip.avi")
    w, h = 640, 360
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    assert writer.isOpened(), "MJPG writer unavailable"
    frames = []
    for i in range(12):
        bgr = np.full((h, w, 3), 30 + i * 5, dtype=np.uint8)
        bgr[40 : 60 + i, 100:200] = (0, 0, 255)
        frames.append(bgr)
        writer.write(bgr)
    writer.release()
    return path, frames


def test_video_source_grab_and_eof(demo_video):
    path, frames = demo_video
    src = capture.VideoSource(path)
    got = 0
    while True:
        f = src.grab()
        if f is None:
            break
        assert f.image.shape == (360, 640, 4)
        assert (f.image[..., 3] == 255).all()
        got += 1
    assert got == len(frames)
    src.close()

    # loop=True restarts at EOF
    src = capture.VideoSource(path, loop=True)
    for _ in range(len(frames) + 3):
        assert src.grab() is not None
    src.close()


def test_video_source_step_and_iter(demo_video):
    path, frames = demo_video
    src = capture.VideoSource(path, step=3)
    got = list(src.iter_frames())
    assert len(got) == len(frames) // 3
    src.close()


def test_video_source_feeds_capture_thread(demo_video):
    import time

    path, _ = demo_video
    src = capture.VideoSource(path, loop=True)
    cap = capture.CaptureThread(src, hz=200).start()
    deadline = time.time() + 5
    seen = 0
    while seen < 4 and time.time() < deadline:
        if cap.fresh_frame() is not None:
            seen += 1
        time.sleep(0.01)
    cap.stop()
    src.close()
    assert seen >= 4  # distinct frames flow through the crc-deduped mailbox


def test_video_source_through_batch_pipeline(tmp_path):
    """End-to-end offline analysis: synthesized gameplay video -> batched
    detections (the tools/analyze_video.py path)."""
    cv2 = pytest.importorskip("cv2")
    w, h = 1280, 720
    path = str(tmp_path / "game.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    assert writer.isOpened()
    for i in range(4):
        bgra = testing.make_frame(
            w, h, marker_lines=[((100 + 5 * i, 100), (420, 300))],
            scale_bars=[(60, 200, 120, 1)],
        )
        writer.write(np.ascontiguousarray(bgra[..., :3]))
    writer.release()

    from smh_tpu.vision.batch import BatchPipeline

    src = capture.VideoSource(path)
    frames = list(src.iter_frames())
    src.close()
    assert len(frames) == 4

    bp = BatchPipeline(w, h, batch=4, ocr_engine=None)
    results = bp.process(frames)
    bp.close()
    # MJPG is lossy but the fireteam-colored line must still detect.
    assert all(not r.sleeping for r in results)
    assert all(len(r.markers) >= 1 for r in results)


def test_screen_source_raises_cleanly_headless(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    with pytest.raises(RuntimeError, match="screen capture"):
        capture.ScreenSource()


def test_x11_bgra_conversion():
    """ZPixmap rows with stride padding + undefined pad byte -> BGRA."""
    w, h, stride = 3, 2, 16  # stride > w*4: trailing pad per row
    raw = bytearray(h * stride)
    for y in range(h):
        for x in range(w):
            o = y * stride + x * 4
            raw[o : o + 4] = bytes([10 * y + x, 100 + x, 200 - x, 7])  # B,G,R,junk
    out = capture._x11_bgra(bytes(raw), w, h, stride)
    assert out.shape == (2, 3, 4)
    assert out[1, 2, 0] == 12 and out[1, 2, 1] == 102 and out[1, 2, 2] == 198
    assert (out[..., 3] == 255).all()  # alpha forced opaque
    assert out.flags["C_CONTIGUOUS"]


def test_blackout_fallback_with_screen_semantics():
    """A ScreenSource returning None (transient failure) must read as
    blackout-eligible 'no frame' and flow to the fallback."""

    class Dead:
        def grab(self):
            return None

    frame = testing.make_frame(320, 200)
    fb = capture.BlackoutFallbackSource(Dead(), capture.StaticSource(frame))
    got = fb.grab()
    assert got is not None and got.image.shape == (200, 320, 4)
