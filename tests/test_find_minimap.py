import jax
import numpy as np
import pytest

from conftest import REFERENCE_SAMPLES, reference_samples_available
from smh_tpu import consts as C
from smh_tpu.ops import pipeline as opp
from smh_tpu.vision import find_minimap as fm


def synthetic_view(seed=0, w=400, h=300):
    """Noisy background with a quiet (uniform) inner rectangle."""
    rng = np.random.default_rng(seed)
    view = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    view[60:240, 80:320] = (100, 110, 120, 255)  # quiet box around the centre
    return view


def host_quiet(view):
    h, w = view.shape[:2]
    q = np.zeros((h, w), dtype=bool)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            q[y, x] = fm.get_edginess(view, x, y) <= fm.EDGINESS_THRESHOLD
    return q


def test_quiet_map_device_matches_host():
    view = synthetic_view(w=96, h=64)
    # Device path computes quiet over the map region; feed the view directly.
    q_dev = np.asarray(opp._edgy_quiet(jax.numpy.asarray(view)))
    q_host = host_quiet(view)
    assert (q_dev[1:-1, 1:-1] == q_host[1:-1, 1:-1]).all()


def test_fast_walk_matches_oracle_synthetic():
    for seed in range(3):
        view = synthetic_view(seed=seed)
        slow = fm.find_minimap(view)
        q = np.asarray(opp._edgy_quiet(jax.numpy.asarray(view)))
        fast = fm.find_minimap_quiet(q)
        assert slow == fast, (seed, slow, fast)


@pytest.mark.skipif(not reference_samples_available(), reason="no reference samples")
def test_fast_walk_matches_oracle_real_sample():
    from smh_tpu.squadex.capture import load_frame_bgra

    frame = load_frame_bgra(str(REFERENCE_SAMPLES / "point.png"))
    g = C.map_geometry(frame.shape[1], frame.shape[0])
    view = frame[g.map_y : g.map_y + g.map_h, g.map_x : g.map_x + g.map_w]
    slow = fm.find_minimap(view)
    q = np.asarray(opp._edgy_quiet(jax.numpy.asarray(view)))
    fast = fm.find_minimap_quiet(q)
    assert slow == fast


def test_device_minimap_rect_matches_host_walk():
    """ops/pipeline._minimap_rect (device, in-pack) must equal the host walk
    find_minimap_quiet on arbitrary quiet masks (both port
    find_minimap.rs:48-146)."""
    import jax
    import numpy as np

    from smh_tpu.ops import pipeline as ops_pipeline
    from smh_tpu.vision import find_minimap as fm

    rng = np.random.default_rng(11)
    # Fixed shape buckets (12 random shapes would jit _minimap_rect 12
    # times — ~50 s of this test's runtime was compiles, not checking).
    # Content still varies every trial; shapes cover small/odd/rectangular.
    shapes = [(24, 33), (25, 31), (96, 220), (180, 160)]
    for trial in range(12):
        h, w = shapes[trial % len(shapes)]
        density = rng.uniform(0.3, 0.95)
        quiet = rng.random((h, w)) < density
        # Sometimes add a clean minimap-like quiet rectangle around centre.
        if trial % 3 == 0:
            cy, cx = h // 2, w // 2
            quiet[max(0, cy - h // 4) : cy + h // 4, max(0, cx - w // 4) : cx + w // 4] = True

        host = fm.find_minimap_quiet(quiet)
        dev = np.asarray(ops_pipeline._minimap_rect(jax.numpy.asarray(quiet)))
        assert host is not None
        got = (int(dev[0]), int(dev[1]), int(dev[2]), int(dev[3]))
        want = (host.left, host.top, host.right, host.bottom)
        assert got == want, f"trial {trial} {h}x{w} d={density:.2f}: {got} != {want}"
