"""JAX HSV conversion and marker classification (oracle-matching f32 math).

Mirrors smh_tpu.vision.pixmath (the numpy oracle), which in turn mirrors
/root/reference/util/src/image.rs:159-202 and
/root/reference/vision-common/src/markers/mod.rs:16-54. All arithmetic is
float32 with the oracle's order of operations; comparisons happen on the
truncated integer h/s/v exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import consts as C

F32 = jnp.float32


def luma8_planes(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma on channel PLANES (the production layout: interleaved
    [h,w,3] arrays force XLA to emit a multi-ms planarizing layout copy at
    4K — every channel consumer here slices planes anyway)."""
    l = (
        F32(0.2126) * r.astype(F32) + F32(0.7152) * g.astype(F32)
    ) + F32(0.0722) * b.astype(F32)
    return l.astype(jnp.uint8)


def luma8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma, f32 accumulate, truncating cast (image-0.23 semantics)."""
    return luma8_planes(rgb_u8[..., 0], rgb_u8[..., 1], rgb_u8[..., 2])


def rgb_to_hsv_u8(rgb_u8: jnp.ndarray):
    """(h u16, s u8, v u8) with the oracle's truncation semantics."""
    return rgb_to_hsv_u8_planes(rgb_u8[..., 0], rgb_u8[..., 1], rgb_u8[..., 2])


def rgb_to_hsv_u8_planes(r8: jnp.ndarray, g8: jnp.ndarray, b8: jnp.ndarray):
    r = r8.astype(F32) / F32(255.0)
    g = g8.astype(F32) / F32(255.0)
    b = b8.astype(F32) / F32(255.0)

    mx = jnp.maximum(r, jnp.maximum(g, b))
    mn = jnp.minimum(r, jnp.minimum(g, b))
    delta = mx - mn
    safe_delta = jnp.where(delta == 0, F32(1.0), delta)

    h_r = F32(60.0) * ((g - b) / safe_delta)
    h_g = F32(60.0) * (((b - r) / safe_delta) + F32(2.0))
    h_b = F32(60.0) * (((r - g) / safe_delta) + F32(4.0))

    h = jnp.where(mx == mn, F32(0.0), jnp.where(mx == r, h_r, jnp.where(mx == g, h_g, h_b)))
    h = jnp.where(h < F32(0.0), h + F32(360.0), h)

    safe_mx = jnp.where(mx == 0, F32(1.0), mx)
    s = jnp.where(mx > F32(0.0), (F32(100.0) * delta) / safe_mx, F32(0.0))
    v = F32(100.0) * mx

    return h.astype(jnp.uint16), s.astype(jnp.uint8), v.astype(jnp.uint8)


def is_any_map_marker_color(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Fireteam marker-color predicate -> bool, matching the oracle."""
    return is_any_map_marker_color_planes(
        rgb_u8[..., 0], rgb_u8[..., 1], rgb_u8[..., 2]
    )


def is_any_map_marker_color_planes(
    r8: jnp.ndarray, g8: jnp.ndarray, b8: jnp.ndarray
) -> jnp.ndarray:
    h, s, v = rgb_to_hsv_u8_planes(r8, g8, b8)
    h = h.astype(jnp.int32)
    s = s.astype(jnp.int32)
    v = v.astype(jnp.int32)

    ok = jnp.zeros(h.shape, dtype=bool)
    for mh, ms, mv in (
        C.ALPHA_MARKER_COLOR_HSV,
        C.BRAVO_MARKER_COLOR_HSV,
        C.CHARLIE_MARKER_COLOR_HSV,
    ):
        hue_ok = jnp.abs(h - mh) <= C.FIND_MARKER_HSV_HUE_TOLERANCE
        sat_ok = jnp.abs(s - ms) <= C.FIND_MARKER_HSV_SAT_TOLERANCE
        arc_ok = jnp.abs(s - (ms - C.FIND_MARKER_PLAYER_DIR_ARC_SAT)) <= C.FIND_MARKER_HSV_SAT_TOLERANCE
        vib_ok = jnp.abs(v - mv) <= C.FIND_MARKER_HSV_VIB_TOLERANCE
        ok = ok | (hue_ok & (sat_ok | arc_ok) & vib_ok)

    return ok & (s >= C.FIND_MARKER_HSV_MIN_SAT)
