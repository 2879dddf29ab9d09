"""Native C++ module vs numpy oracle: exact-parity tests."""

import time

import numpy as np
import pytest

from conftest import REFERENCE_SAMPLES, reference_samples_available
from smh_tpu import native, testing
from smh_tpu.geometry import Point
from smh_tpu.vision import lsd as vlsd
from smh_tpu.vision import pixmath as pm
from smh_tpu.vision.reference import ReferenceBackend, find_longest_line as oracle_march
from smh_tpu.utils.plot import plot_line

pytestmark = pytest.mark.skipif(not native.available(), reason="native build unavailable")


def make_mask(seed=0):
    rng = np.random.default_rng(seed)
    mask = np.zeros((300, 400), dtype=np.uint8)
    plot_line(mask, 30, 40, 350, 250, 255)
    plot_line(mask, 100, 250, 380, 60, 255)
    mask = pm.dilate_l1_radius1(mask)
    mask[rng.integers(0, 300, 60), rng.integers(0, 400, 60)] = 255
    return mask


def test_march_exact_parity():
    mask = make_mask()
    # On-line seeds have a unique dominant ray: endpoints must match to float
    # noise (native uses libm cosf like Rust; numpy's cos can differ by ulps,
    # which only matters on exact ties).
    for pt in [Point(30.0, 40.0), Point(200.0, 150.0), Point(100.5, 250.5)]:
        lo, leno = oracle_march(mask, pt, 15.0)
        ln, lenn = native.find_longest_line(mask, pt, 15.0)
        assert abs(lo.p1.x - ln.p1.x) < 0.01 and abs(lo.p1.y - ln.p1.y) < 0.01, (pt, lo, ln)
        assert abs(leno - lenn) <= max(1e-2, 1e-5 * leno)
    # Background seed: many equal-length rays -> only the length is pinned.
    lo, leno = oracle_march(mask, Point(5.0, 5.0), 15.0)
    ln, lenn = native.find_longest_line(mask, Point(5.0, 5.0), 15.0)
    assert abs(leno - lenn) <= max(1e-2, 1e-4 * leno)


def test_find_lines_exact_parity():
    mask = make_mask(seed=3)
    py_lines = vlsd.find_lines(mask, 15, oracle_march)
    nat_lines = native.find_lines(mask, 15)
    assert len(py_lines) == len(nat_lines)
    for a, b in zip(py_lines, nat_lines):
        assert abs(a.p0.x - b.p0.x) < 1e-4 and abs(a.p0.y - b.p0.y) < 1e-4
        assert abs(a.p1.x - b.p1.x) < 1e-4 and abs(a.p1.y - b.p1.y) < 1e-4


@pytest.mark.skipif(not reference_samples_available(), reason="no reference samples")
def test_find_lines_parity_real_sample():
    from smh_tpu.squadex.capture import load_frame_bgra

    frame = load_frame_bgra(str(REFERENCE_SAMPLES / "point_intersect.png"))
    be = ReferenceBackend()
    be.load_frame(frame)
    assert be.crop_to_map(grayscale=True) is not None
    be.isolate_map_markers()
    be.mask_marker_lines()
    py_lines = be.find_marker_lines(15)
    nat_lines = native.find_lines(be.lsd_image, 15)
    assert len(py_lines) == len(nat_lines) == 2
    for a, b in zip(py_lines, nat_lines):
        assert abs(a.p1.x - b.p1.x) < 1e-3 and abs(a.p1.y - b.p1.y) < 1e-3
