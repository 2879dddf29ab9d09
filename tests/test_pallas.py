"""Pallas classify kernel parity (interpret mode on the CPU platform)."""

import jax.numpy as jnp
import numpy as np

from smh_tpu.ops import hsv as jhsv
from smh_tpu.ops.pallas_kernels import classify_luma_pallas


def test_pallas_classify_matches_jnp():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(300, 520, 3), dtype=np.uint8)  # ragged tiles
    marker_p, luma_p = classify_luma_pallas(jnp.asarray(rgb), interpret=True)

    marker_j = np.asarray(jhsv.is_any_map_marker_color(jnp.asarray(rgb)))
    luma_j = np.asarray(jhsv.luma8(jnp.asarray(rgb)))

    marker_p = np.asarray(marker_p).astype(bool)
    luma_p = np.asarray(luma_p)

    # Same arithmetic inside and out, but FMA contraction can differ between
    # the pallas and jnp lowerings: truncated values flip by one in ~1e-5 of
    # pixels at exact integer boundaries.
    assert (marker_p == marker_j).mean() > 0.9999
    assert (luma_p == luma_j).mean() > 0.9999
    assert (np.abs(luma_p.astype(int) - luma_j.astype(int)) <= 1).all()


def test_pallas_marker_hits_synthetic():
    from smh_tpu import testing

    rgb = np.full((64, 256, 3), 40, dtype=np.uint8)
    rgb[10:20, 30:90] = testing.ALPHA_MARKER_RGB
    marker, _ = classify_luma_pallas(jnp.asarray(rgb), interpret=True)
    marker = np.asarray(marker).astype(bool)
    assert marker[12, 50] and not marker[0, 0]
    assert marker.sum() == 10 * 60
