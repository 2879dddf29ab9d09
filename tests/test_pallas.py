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


def test_fused_mask_bits_matches_xla():
    from smh_tpu.ops import pipeline as opp
    from smh_tpu.ops.pallas_kernels import fused_mask_bits_pallas

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(300, 521, 3), dtype=np.uint8)
    bits_p = np.asarray(fused_mask_bits_pallas(jnp.asarray(rgb), interpret=True))
    marker = jhsv.is_any_map_marker_color(jnp.asarray(rgb))
    bits_x = np.asarray(opp.pack_bits(opp._dilate_l1_radius1_bool(marker)))
    m_p = opp.unpack_bits_host(bits_p, 521)
    m_x = opp.unpack_bits_host(bits_x, 521)
    # ulp flips at HSV integer boundaries only
    assert (m_p == m_x).mean() > 0.999


def test_fused_mask_bits_exact_on_clean_colors():
    """Solid marker box far from thresholds: bit-exact incl. the dilate ring
    and band-boundary halos (box spans the 256-row band seam)."""
    from smh_tpu.ops import pipeline as opp
    from smh_tpu import testing
    from smh_tpu.ops.pallas_kernels import fused_mask_bits_pallas

    rgb = np.full((520, 264, 3), 40, dtype=np.uint8)
    rgb[250:262, 100:140] = testing.ALPHA_MARKER_RGB  # crosses row 256
    bits = np.asarray(fused_mask_bits_pallas(jnp.asarray(rgb), interpret=True))
    m = opp.unpack_bits_host(bits, 264).astype(bool)
    marker = np.zeros((520, 264), dtype=bool)
    marker[250:262, 100:140] = True
    expected = np.asarray(opp._dilate_l1_radius1_bool(jnp.asarray(marker)))
    assert (m == expected).all()
