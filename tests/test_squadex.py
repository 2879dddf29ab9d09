import io
import math

import numpy as np

from smh_tpu.geometry import Line, Point, Rect
from smh_tpu.squadex import heightmaps, milliradians, solutions


def test_milliradians_basic():
    # Level shot at 100m: high-angle mortar solution, finite, in (800, 1600).
    mil = milliradians.calc(100.0, 0.0)
    assert 800.0 < mil < 1600.0
    # Longer range -> lower angle -> fewer mils.
    assert milliradians.calc(500.0, 0.0) < milliradians.calc(100.0, 0.0)
    # Uphill target needs more elevation... (higher angle = more mils at same range)
    assert milliradians.calc(500.0, 50.0) > 0
    # Out of range -> NaN (discriminant < 0). Max range ~ v^2/g ~ 1232m.
    assert math.isnan(milliradians.calc(5000.0, 0.0))
    # In-range boundary sanity.
    assert not math.isnan(milliradians.calc(1200.0, 0.0))


def test_milliradians_known_identity():
    # At 45 deg (=800 mil) the range is maximal: v^2/g = 1232.26...
    v, g = milliradians.VELOCITY, milliradians.GRAVITY
    max_range = v * v / g
    mil = milliradians.calc(max_range * (1.0 - 1e-9), 0.0)
    assert abs(mil - 800.0) < 1.0


def test_heightmap_roundtrip():
    rng = np.random.default_rng(0)
    hm = heightmaps.Heightmap(
        width=64,
        height=48,
        bounds=((-100, -200), (300, 400)),
        scale=(100.0, 100.0, 512.0),
        data=rng.integers(0, 65536, size=(48, 64), dtype=np.uint16),
    )
    buf = io.BytesIO()
    heightmaps.serialize(buf, hm)
    buf.seek(0)
    hm2 = heightmaps.deserialize(buf)
    assert hm2 is not None
    assert hm2.width == 64 and hm2.height == 48
    assert hm2.bounds == ((-100, -200), (300, 400))
    assert hm2.scale == (100.0, 100.0, 512.0)
    assert (hm2.data == hm.data).all()


def test_heightmap_bad_magic():
    buf = io.BytesIO(b"\x00" * 64)
    assert heightmaps.deserialize(buf) is None


def test_heightmap_height_scale():
    hm = heightmaps.Heightmap(
        width=2,
        height=1,
        bounds=((0, 0), (0, 0)),
        scale=(100.0, 100.0, 0.1953125 * 100.0),
        data=np.array([[0, 65535]], dtype=np.uint16),
    )
    assert hm.height_at(0, 0) == 0.0
    assert abs(hm.height_at(1, 0) - 100.0) < 1e-9


def test_global_store_gates_scales_branch():
    assert not heightmaps.is_set()
    hm = heightmaps.Heightmap(
        width=1, height=1, bounds=((0, 0), (0, 0)), scale=(1, 1, 1),
        data=np.zeros((1, 1), dtype=np.uint16),
    )
    heightmaps.set_current(hm)
    assert heightmaps.is_set()
    heightmaps.set_current(None)
    assert not heightmaps.is_set()


def test_solution_ratio_only():
    line = Line(Point(0.0, 0.0), Point(300.0, 400.0))  # 500 px
    sol = solutions.solve(line, meters_to_px_ratio=2.0)
    assert sol is not None
    assert abs(sol.meters - 1000.0) < 1e-9
    assert sol.alt_delta is None
    assert not math.isnan(sol.mil_fwd)


def test_solution_bearings():
    # Vertical line pointing up (p1 above p0): firing from p0 at p1 = north (0 deg).
    sol = solutions.solve(Line(Point(0, 100), Point(0, 0)), meters_to_px_ratio=1.0)
    # angle = atan2(100-0, 0-0) = pi/2 -> deg 90 -> fwd = 0
    assert sol.bearing_fwd == 0.0 and sol.bearing_bck == 180.0
    # East
    sol = solutions.solve(Line(Point(0, 0), Point(100, 0)), meters_to_px_ratio=1.0)
    assert sol.bearing_fwd in (90.0, 270.0)


def test_solution_heightmap():
    data = np.zeros((100, 100), dtype=np.uint16)
    data[:, 50:] = 65535
    hm = heightmaps.Heightmap(
        width=100, height=100, bounds=((0, 0), (0, 0)),
        scale=(100.0, 100.0, 0.1953125 * 50.0), data=data,
    )
    bounds = Rect(left=0, top=0, right=100, bottom=100)
    line = Line(Point(10.0, 50.0), Point(90.0, 50.0))
    sol = solutions.solve(line, minimap_bounds=bounds, heightmap=hm, fit_to_minimap=True)
    assert sol is not None
    assert abs(sol.meters - 80.0) < 1e-9
    assert abs(sol.alt_delta - 50.0) < 1e-6
    # Endpoint projecting outside the heightmap -> falls back to None (no ratio)
    line2 = Line(Point(10.0, 50.0), Point(150.0, 50.0))
    assert solutions.solve(line2, minimap_bounds=bounds, heightmap=hm, fit_to_minimap=True) is None
