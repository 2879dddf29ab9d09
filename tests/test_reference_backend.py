import math

import numpy as np
import pytest

from smh_tpu import consts as C, testing
from smh_tpu.geometry import Line, Point
from smh_tpu.vision.reference import DebugView, ReferenceBackend


def detect(frame, max_gap=15):
    be = ReferenceBackend()
    be.load_frame(frame)
    cropped = be.crop_to_map(grayscale=True)
    if cropped is None:
        return None, be
    be.isolate_map_markers()
    be.mask_marker_lines()
    return be.find_marker_lines(max_gap), be


def line_matches(found: Line, expected, tol=6.0):
    (ex0, ey0), (ex1, ey1) = expected
    d_fwd = max(
        math.hypot(found.p0.x - ex0, found.p0.y - ey0),
        math.hypot(found.p1.x - ex1, found.p1.y - ey1),
    )
    d_bck = max(
        math.hypot(found.p0.x - ex1, found.p0.y - ey1),
        math.hypot(found.p1.x - ex0, found.p1.y - ey0),
    )
    return min(d_fwd, d_bck) <= tol


def test_sleeping_without_button():
    frame = testing.make_frame(1280, 720, with_button=False)
    be = ReferenceBackend()
    be.load_frame(frame)
    assert be.crop_to_map(grayscale=True) is None


def test_detects_single_line():
    expected = ((100, 100), (420, 300))
    frame = testing.make_frame(1280, 720, marker_lines=[expected])
    lines, be = detect(frame)
    assert lines is not None and len(lines) == 1
    assert line_matches(lines[0], expected)


def test_detects_multiple_lines():
    g = C.map_geometry(1920, 1080)
    expected = [
        ((50, 50), (350, 60)),
        ((100, 400), (500, 700)),
        ((700, 100), (700, 500)),
    ]
    frame = testing.make_frame(1920, 1080, marker_lines=expected)
    lines, _ = detect(frame)
    assert lines is not None and len(lines) == 3
    for exp in expected:
        assert any(line_matches(l, exp) for l in lines), f"missing {exp}"
    for l in lines:
        assert 0 <= l.p0.x <= g.map_w and 0 <= l.p0.y <= g.map_h


def test_short_line_rejected():
    # length 30 < 50px threshold (LSD_MIN_LENGTH_SQR = 2500)
    frame = testing.make_frame(1280, 720, marker_lines=[((100, 100), (130, 100))])
    lines, _ = detect(frame)
    assert lines == []


def test_gap_bridged():
    # Two collinear segments separated by a small gap are detected as one line.
    frame = testing.make_frame(
        1280, 720, marker_lines=[((100, 200), (250, 200)), ((258, 200), (400, 200))]
    )
    lines, _ = detect(frame)
    assert len(lines) == 1
    assert line_matches(lines[0], ((100, 200), (400, 200)), tol=8.0)


def test_gap_too_large_not_bridged():
    frame = testing.make_frame(
        1280, 720, marker_lines=[((100, 200), (250, 200)), ((290, 200), (440, 200))]
    )
    lines, _ = detect(frame)
    # 40px gap > max_gap 15: the march must stop at ~250. The second collinear
    # segment is then *suppressed* by the infinite-line dedup (lsd.rs:84-89),
    # so exactly one line comes back — matching the reference's semantics.
    assert len(lines) == 1
    assert line_matches(lines[0], ((100, 200), (250, 200)), tol=8.0)


def test_parallel_offset_lines_both_detected():
    # Two parallel segments >sqrt(50)px apart are NOT suppressed by dedup.
    frame = testing.make_frame(
        1280, 720, marker_lines=[((100, 200), (250, 200)), ((100, 230), (440, 230))]
    )
    lines, _ = detect(frame)
    assert len(lines) == 2


def test_ui_map_grayscale_and_color():
    frame = testing.make_frame(1280, 720)
    be = ReferenceBackend()
    be.load_frame(frame)
    ui_map, (x, y, w, h) = be.crop_to_map(grayscale=True)
    assert ui_map.shape == (h, w, 4)
    assert (ui_map[..., 0] == ui_map[..., 1]).all()
    ui_map2, _ = be.crop_to_map(grayscale=False)
    # background is (r,g,b)=(90,80,70)
    assert tuple(ui_map2[0, 0, :3]) == (90, 80, 70)
    assert ui_map2[0, 0, 3] == 255


def test_debug_views():
    frame = testing.make_frame(1280, 720, marker_lines=[((100, 100), (300, 200))])
    _, be = detect(frame)
    be.ocr_preprocess()
    be.find_scales_preprocess(0)
    for dv in DebugView:
        view = be.get_debug_view(dv)
        if dv == DebugView.NONE:
            assert view is None
        else:
            assert view is not None and view.shape[2] == 4


def test_find_longest_line_angle_sweep():
    # A diagonal line: the longest ray from its start should reach the far end.
    from smh_tpu.vision.reference import find_longest_line
    from smh_tpu.vision.pixmath import dilate_l1_radius1

    mask = np.zeros((200, 200), dtype=np.uint8)
    from smh_tpu.utils.plot import plot_line

    plot_line(mask, 20, 30, 150, 160, 255)
    mask = dilate_l1_radius1(mask)
    line, length = find_longest_line(mask, Point(20.0, 30.0), 15.0)
    assert length > 2500.0
    assert math.hypot(line.p1.x - 150, line.p1.y - 160) < 6.0
