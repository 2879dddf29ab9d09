"""Self-contained scale OCR: validated on the reference's real screenshots
and through the full pipeline with rendered text."""

import numpy as np
import pytest

from conftest import REFERENCE_SAMPLES, reference_samples_available
from smh_tpu import consts as C, testing
from smh_tpu.ocr.smhocr import SmhOcrEngine
from smh_tpu.settings import Settings
from smh_tpu.squadex.capture import Frame
from smh_tpu.vision.pipeline import VisionState, _parse_scales


@pytest.mark.skipif(not reference_samples_available(), reason="no reference samples")
def test_reads_real_scale_labels():
    from smh_tpu.squadex.capture import load_frame_bgra
    from smh_tpu.vision import mpx_ratio as mpx
    from smh_tpu.vision.reference import ReferenceBackend

    frame = load_frame_bgra(str(REFERENCE_SAMPLES / "point.png"))
    be = ReferenceBackend()
    be.load_frame(frame)
    assert be.crop_to_map(True) is not None
    ocr_img = be.ocr_preprocess()

    results = SmhOcrEngine().read(ocr_img)
    texts = {r.text for r in results}
    assert "300m" in texts and "900m" in texts

    # Internal consistency proves the digits: meters/bar-width must agree
    # across the two scale bars (they do on this screenshot within ~1.5%).
    scales, start_y = _parse_scales(results)
    assert [m for m, _ in scales] == [300, 900]
    img = be.find_scales_preprocess(start_y)
    ratios = [mpx.find_scale_width(m, xy, img) for m, xy in scales]
    assert all(r is not None for r in ratios)
    assert abs(ratios[0] - ratios[1]) / ratios[0] < 0.03


def render_text_frame(text="300m", size=20):
    """Synthetic frame with REAL rendered text in the BRQ (white on dark:
    exactly what the OCR preprocess keeps)."""
    from PIL import Image, ImageDraw, ImageFont

    frame = testing.make_frame(
        1280, 720, marker_lines=[((100, 100), (420, 300))], scale_bars=[(60, 200, 120, 1)]
    )
    g = C.map_geometry(1280, 720)
    font = ImageFont.truetype("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size)
    img = Image.new("L", (g.brq_w, g.brq_h), 0)
    d = ImageDraw.Draw(img)
    # bottom of text must sit a few rows above the bar at y=200
    d.text((100, 172), text, fill=255, font=font)
    arr = np.asarray(img)
    ys, xs = np.nonzero(arr > 60)
    view = frame[g.brq_y : g.brq_y + g.brq_h, g.brq_x : g.brq_x + g.brq_w]
    view[ys, xs, 0] = 245
    view[ys, xs, 1] = 245
    view[ys, xs, 2] = 245
    return frame


def test_full_pipeline_with_smhocr():
    """End to end: rendered '300m' text + scale bar -> engine -> ratio."""
    settings = Settings(path=None)
    settings.set("hardware_acceleration", False)
    state = VisionState(settings=settings, ocr_engine=SmhOcrEngine())
    res = state.process(Frame(render_text_frame()))
    state.close()
    assert res is not None
    assert len(res.markers) == 1
    assert res.meters_to_px_ratio is not None
    # bar width 118 px (ends at 60 and 180) -> 300/118
    assert res.meters_to_px_ratio == pytest.approx(300 / 118, rel=1e-6)


def test_rejects_garbage():
    eng = SmhOcrEngine()
    rng = np.random.default_rng(0)
    noise = np.where(rng.random((200, 300)) > 0.995, np.uint8(0), np.uint8(255))
    results = eng.read(noise)
    scales, _ = _parse_scales(results)
    assert scales == []  # specks don't parse into "<N>m"

    blank = np.full((100, 100), 255, dtype=np.uint8)
    assert eng.read(blank) == []


@pytest.mark.parametrize("text,expected", [("600m", 600), ("900m", 900), ("150m", 150), ("1200m", 1200)])
def test_digit_discrimination(text, expected):
    """6/9 and other confusable digits must resolve correctly on rendered text."""
    eng = SmhOcrEngine()
    frame = render_text_frame(text=text)
    from smh_tpu.vision.reference import ReferenceBackend

    be = ReferenceBackend()
    be.load_frame(frame)
    assert be.crop_to_map(True) is not None
    results = eng.read(be.ocr_preprocess())
    scales, _ = _parse_scales(results)
    assert [m for m, _ in scales] == [expected], results


@pytest.mark.skipif(not reference_samples_available(), reason="no reference samples")
def test_corpus_scale_reading_no_false_positives():
    """Across the whole corpus: every parsed scale is exactly the real
    (300m, 900m) pair at its known position — noise NEVER parses into a
    bogus scale (even on whiteout.png), and 2560x1440 samples always read."""
    import json
    import pathlib

    from smh_tpu.squadex.capture import load_frame_bgra
    from smh_tpu.vision.reference import ReferenceBackend

    goldens = json.loads(
        (pathlib.Path(__file__).parent / "goldens" / "detections.json").read_text()
    )
    eng = SmhOcrEngine()
    read_count = 0
    for name, g in sorted(goldens.items()):
        if g.get("sleeping"):
            continue
        frame = load_frame_bgra(str(REFERENCE_SAMPLES / name))
        be = ReferenceBackend()
        be.load_frame(frame)
        if be.crop_to_map(True) is None:
            continue
        scales, _ = _parse_scales(eng.read(be.ocr_preprocess()))
        if scales:
            assert [m for m, _ in scales] == [300, 900], (name, scales)
            read_count += 1
    # 13 of the clean-PNG screenshots read in practice; lossy-derived samples
    # (JPEGs, video captures, snow themes) may not — compression noise
    # defeats the OCR preprocess's monochromaticity mask.
    assert read_count >= 12
