"""The browser client's math, pinned and cross-checked without a browser.

No JS engine ships in this image (no node/deno, no playwright browsers), so
the client's re-implementations of the solution math (web/www/index.html;
reference mirror: /root/reference/web/www/map.js:109-341, squadex.js) are
validated in two coupled layers:

 1. SOURCE PINS: the exact formula lines must appear in the shipped HTML
    (whitespace-normalized). Editing a client formula fails here, forcing
    the editor to update BOTH the pin and its Python twin below...
 2. TWIN SEMANTICS: ...and the Python twin of each pinned formula is then
    property-checked against the real squadex implementations over input
    grids, so the pinned client math provably agrees with the server math
    (including the Rust round-half-away vs JS Math.round subtlety: the
    client only ever rounds non-negative bearing values, where the two
    agree — asserted below).

A full-render headless test (test_web_client_headless.py) runs wherever a
browser automation stack exists and skips here.
"""

import math
import pathlib
import re

import numpy as np
import pytest

from smh_tpu.geometry import Line, Rect
from smh_tpu.squadex import milliradians, solutions
from smh_tpu.squadex.heightmaps import Heightmap

HTML = (
    pathlib.Path(__file__).parent.parent / "smh_tpu" / "web" / "www" / "index.html"
).read_text()


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


NORM_HTML = _norm(HTML)


def assert_pinned(snippet: str) -> None:
    assert _norm(snippet) in NORM_HTML, f"client formula drifted: {snippet!r}"


# ---- 1. source pins ---------------------------------------------------------

def test_client_constants_pinned():
    assert_pinned("const GRAVITY = 9.8, VELOCITY = 109.890938;")
    assert_pinned("const ZOOM_MAX_LEVELS = 10, ZOOM_MAX = 4.0;")
    # UE Z divisor in the altitude decode (reference squadex.js / SMHHM).
    assert_pinned("return (v / 65535) * (hm.scaleZ / 0.1953125);")


def test_client_mils_formula_pinned():
    assert_pinned(
        "const disc = VELOCITY**4 - GRAVITY*(GRAVITY*meters*meters"
        " + 2*altDelta*VELOCITY*VELOCITY);"
    )
    assert_pinned(
        "const a1 = (meters === 0) ? Math.PI/2"
        " : Math.atan((VELOCITY*VELOCITY + Math.sqrt(disc)) / (GRAVITY*meters));"
    )
    assert_pinned("return a1 * (180/Math.PI) / (360/6400);")


def test_client_bearings_formula_pinned():
    assert_pinned("const angle = Math.atan2(p0[1]-p1[1], p0[0]-p1[0]);")
    assert_pinned(
        "if (fwd > 0) { fwd -= 90; if (fwd < 0) fwd += 360; } else { fwd += 270; }"
    )
    assert_pinned("fwd = Math.round(fwd) % 360;")
    assert_pinned("return [fwd, Math.round(fwd + 180) % 360];")


def test_client_round_half_away_pinned():
    assert_pinned(
        "function roundHalfAway(v) { return v >= 0 ? Math.floor(v + 0.5)"
        " : Math.ceil(v - 0.5); }"
    )


def test_client_viewport_formula_pinned():
    assert_pinned("const fit = Math.min(vw / S.mapW, vh / S.mapH);")
    assert_pinned(
        "const scale = fit * (1 + (ZOOM_MAX - 1) * (S.zoom / ZOOM_MAX_LEVELS));"
    )
    assert_pinned("toScreenX: x => (x - cx) * scale + vw/2,")
    assert_pinned("toMapX: sx => (sx - vw/2) / scale + cx,")


def test_client_hm_placement_pinned():
    assert_pinned("offX = hm.boundsX * ((mm.right - mm.left) / (hm.w + hm.boundsX));")
    assert_pinned("offY = hm.boundsY * ((mm.bottom - mm.top) / (hm.h + hm.boundsY));")
    assert_pinned("const left = mm.left + offX, top = mm.top + offY;")


# ---- 2. twin semantics ------------------------------------------------------

def js_calc_mils(meters: float, alt_delta: float) -> float:
    """Python twin of the pinned client calcMils (f64 arithmetic matches)."""
    GRAVITY, VELOCITY = 9.8, 109.890938
    disc = VELOCITY**4 - GRAVITY * (
        GRAVITY * meters * meters + 2 * alt_delta * VELOCITY * VELOCITY
    )
    if disc < 0:
        return float("nan")
    a1 = (
        math.pi / 2
        if meters == 0
        else math.atan((VELOCITY * VELOCITY + math.sqrt(disc)) / (GRAVITY * meters))
    )
    return a1 * (180 / math.pi) / (360 / 6400)


def js_bearings(p0, p1):
    """Python twin of the pinned client bearings (JS Math.round: half
    toward +inf = floor(x+0.5) for the non-negative values used here)."""
    angle = math.atan2(p0[1] - p1[1], p0[0] - p1[0])
    fwd = angle * 180 / math.pi
    if fwd > 0:
        fwd -= 90
        if fwd < 0:
            fwd += 360
    else:
        fwd += 270
    assert fwd >= 0, "client Math.round only sees non-negative bearings"
    fwd = math.floor(fwd + 0.5) % 360
    return fwd, math.floor(fwd + 180 + 0.5) % 360


def test_client_mils_matches_milliradians():
    for meters in [0.0, 1.0, 49.9, 50.0, 123.4, 456.0, 800.0, 1232.0, 1233.0, 5000.0]:
        for alt in [-120.0, -33.3, 0.0, 12.5, 77.0, 200.0]:
            a = js_calc_mils(meters, alt)
            b = milliradians.calc(meters, alt)
            if math.isnan(b):
                assert math.isnan(a), (meters, alt)
            else:
                # The client multiplies 2*altDelta*V*V left-to-right where
                # Python groups 2.0*(alt*(V**2)): 1 ulp of associativity.
                # The UI displays mils rounded to integers, so <=1e-12 rel
                # is exact for every rendered digit.
                assert a == pytest.approx(b, rel=1e-12), (meters, alt, a, b)


def test_client_bearings_matches_solutions():
    rng = np.random.default_rng(7)
    for _ in range(500):
        x0, y0, x1, y1 = rng.uniform(-1000, 1000, size=4)
        if (x0, y0) == (x1, y1):
            continue
        line = Line.from_tuple(((x0, y0), (x1, y1)))
        fwd, bck = solutions.bearings(line)
        jfwd, jbck = js_bearings((x0, y0), (x1, y1))
        assert (jfwd, jbck) == (fwd, bck), ((x0, y0, x1, y1), (jfwd, jbck), (fwd, bck))


def test_client_altitude_decode_matches_heightmap():
    data = np.arange(0, 65536, 4096, dtype=np.uint16).reshape(4, 4)
    hm = Heightmap(
        width=4, height=4, bounds=((0, 0), (0, 0)),
        scale=(1.0, 1.0, 123.0), data=data,
    )
    for y in range(4):
        for x in range(4):
            v = int(data[y, x])
            js = (v / 65535) * (123.0 / 0.1953125)  # the pinned client line
            assert js == hm.height_at(x, y), (x, y)


def test_client_solve_heightmap_path_matches_solutions():
    """End-to-end twin of the client's solve(): placement offsets, bilinear
    ratio projection, round-half-away indexing, altitude delta and both mil
    directions, vs solutions.solve on the same inputs."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 65536, size=(32, 32), dtype=np.uint16)
    hm = Heightmap(
        width=32, height=32, bounds=((6, 4), (0, 0)),
        scale=(1.0, 1.0, 80.0), data=data,
    )
    mm = Rect(left=100, top=80, right=500, bottom=420)
    for fit in (False, True):
        for _ in range(200):
            x0, y0, x1, y1 = rng.uniform(90, 510, 2).tolist() + rng.uniform(70, 430, 2).tolist()
            line = Line.from_tuple(((x0, y0), (x1, y1)))
            sol = solutions.solve(
                line, meters_to_px_ratio=1.7, minimap_bounds=mm,
                heightmap=hm, fit_to_minimap=fit,
            )
            # client twin
            bx, by = (0.0, 0.0) if fit else (
                6 * ((mm.right - mm.left) / (32 + 6)),
                4 * ((mm.bottom - mm.top) / (32 + 4)),
            )
            left, top = mm.left + bx, mm.top + by
            vw, vh = mm.right - left, mm.bottom - top
            m0x, m0y = (x0 - left) / vw * 32, (y0 - top) / vh * 32
            m1x, m1y = (x1 - left) / vw * 32, (y1 - top) / vh * 32
            r = solutions._round_half_away
            i = [int(r(v)) for v in (m0x, m0y, m1x, m1y)]
            if all(0 <= v < 32 for v in i):
                meters = math.hypot(m0x - m1x, m0y - m1y)
                alt = hm.height_at(i[2], i[3]) - hm.height_at(i[0], i[1])
            else:
                meters = math.hypot(x0 - x1, y0 - y1) * 1.7
                alt = None
            assert sol is not None
            assert sol.meters == pytest.approx(meters, rel=1e-12)
            if alt is None:
                assert sol.alt_delta is None
            else:
                assert sol.alt_delta == pytest.approx(alt, rel=1e-12)
            ad = 0.0 if alt is None else alt
            a = js_calc_mils(meters, ad)
            if math.isnan(sol.mil_fwd):
                assert math.isnan(a)
            else:
                assert a == pytest.approx(sol.mil_fwd, rel=1e-12)
