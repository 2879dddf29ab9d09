"""Pallas TPU kernels for the hot elementwise stage.

The XLA-fused pass is already fast (~0.45 ms device time at 1080p — the
host link, not compute, bounds this pipeline; docs/DESIGN.md §3), so Pallas
is an *optional* backend for the classify stage rather than a necessity.
What it buys:

  * explicit control of arithmetic order (no XLA FMA/reciprocal surprises
    inside the kernel body);
  * a foundation for a future fully-fused single-kernel pass (classify +
    dilate + bit-pack with halo exchange in VMEM) if this ever runs on a
    host link fast enough for device compute to matter.

The kernel computes the fireteam marker predicate + Rec.709 luma for a tile
of the map ROI in one VMEM round trip. Grid tiles are (256, 512) aligned to
the u8 (32, 128) layout; ragged edges are handled by Pallas block padding
(reads of the pad region are computed and discarded on write-back).

ON by default for TPU dispatches since round 3 (validated bit-identical and
~19% faster on a real v5e); SMH_USE_PALLAS=0 opts out. Routing is decided
by ops.pipeline.pallas_mode() — the single source of truth; tests exercise
interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts as C

F32 = jnp.float32

TILE_H = 256
TILE_W = 512


def _classify_luma_kernel(r_ref, g_ref, b_ref, marker_ref, luma_ref):
    r8 = r_ref[...]
    g8 = g_ref[...]
    b8 = b_ref[...]

    # Mosaic has no direct u8<->f32 casts on v5e: hop through i32.
    r = r8.astype(jnp.int32).astype(F32) / F32(255.0)
    g = g8.astype(jnp.int32).astype(F32) / F32(255.0)
    b = b8.astype(jnp.int32).astype(F32) / F32(255.0)

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

    hi = h.astype(jnp.int32)
    si = s.astype(jnp.int32)
    vi = v.astype(jnp.int32)

    ok = jnp.zeros(hi.shape, dtype=jnp.bool_)
    for mh, ms, mv in (
        C.ALPHA_MARKER_COLOR_HSV,
        C.BRAVO_MARKER_COLOR_HSV,
        C.CHARLIE_MARKER_COLOR_HSV,
    ):
        hue_ok = jnp.abs(hi - mh) <= C.FIND_MARKER_HSV_HUE_TOLERANCE
        sat_ok = jnp.abs(si - ms) <= C.FIND_MARKER_HSV_SAT_TOLERANCE
        arc_ok = (
            jnp.abs(si - (ms - C.FIND_MARKER_PLAYER_DIR_ARC_SAT))
            <= C.FIND_MARKER_HSV_SAT_TOLERANCE
        )
        vib_ok = jnp.abs(vi - mv) <= C.FIND_MARKER_HSV_VIB_TOLERANCE
        ok = ok | (hue_ok & (sat_ok | arc_ok) & vib_ok)
    ok = ok & (si >= C.FIND_MARKER_HSV_MIN_SAT)

    marker_ref[...] = ok.astype(jnp.int32).astype(jnp.uint8)

    rf = r8.astype(jnp.int32).astype(F32)
    gf = g8.astype(jnp.int32).astype(F32)
    bf = b8.astype(jnp.int32).astype(F32)
    luma = (F32(0.2126) * rf + F32(0.7152) * gf) + F32(0.0722) * bf
    luma_ref[...] = luma.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def classify_luma_pallas(map_rgb: jnp.ndarray, interpret: bool = False):
    """map_rgb u8 [H, W, 3] -> (marker u8 0/1 [H, W], luma u8 [H, W])."""
    return classify_luma_pallas_planes(
        map_rgb[..., 0], map_rgb[..., 1], map_rgb[..., 2], interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def classify_luma_pallas_planes(
    r8: jnp.ndarray, g8: jnp.ndarray, b8: jnp.ndarray, interpret: bool = False
):
    """Channel-plane entry (the production layout: plane inputs reach the
    kernel with no planarizing layout copy)."""
    h, w = r8.shape
    grid = (pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W))
    plane_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j))

    marker, luma = pl.pallas_call(
        _classify_luma_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
        ),
        grid=grid,
        in_specs=[plane_spec, plane_spec, plane_spec],
        out_specs=(plane_spec, plane_spec),
        interpret=interpret,
    )(r8, g8, b8)
    return marker, luma


# ---------------------------------------------------------------------------
# Fused mask kernel: classify -> L1-dilate -> bit-pack in ONE pass.
#
# The XLA version materializes the marker mask between the classify and
# dilate/pack stages; this kernel keeps everything in VMEM. Row bands carry a
# row halo for the vertical dilate taps (the horizontal taps stay inside a
# full-width band, so no x halo is needed). BlockSpec tiling cannot express
# overlapping input windows (index maps are in block units), so the planes
# stay in HBM and each program DMAs its halo'd band into VMEM scratch.
#
# Mosaic (v5e) constraints encountered and worked around here — kept as
# documentation for future kernels:
#   * no u8<->f32 casts (hop through i32);
#   * kernels cannot capture constant arrays (build weights from iota);
#   * no reshape that splits the lane axis (bit-pack is an MXU matmul
#     against an iota-built selector matrix instead);
#   * pad+slice lane shifts produce unsupported offset layouts (use
#     pltpu.roll — which itself needs 32-bit lanes and non-negative shifts);
#   * DMA slices must be tile-aligned: 8 rows (hence HALO=4 per side) and
#     128 lanes (hence width padding).
# ---------------------------------------------------------------------------

BAND_H = 256
HALO = 4  # rows of halo per side; 1 is enough for the dilate, 4 keeps every
          # DMA slice 8-row aligned (Mosaic tiling requirement)


def _fused_mask_kernel(r_ref, g_ref, b_ref, bits_ref):
    # Rows [band-HALO, band+BAND_H+HALO): compute classify on the halo'd
    # band, then dilate into the interior rows and pack to bits.
    r8 = r_ref[...]
    g8 = g_ref[...]
    b8 = b_ref[...]

    r = r8.astype(jnp.int32).astype(F32) / F32(255.0)
    g = g8.astype(jnp.int32).astype(F32) / F32(255.0)
    b = b8.astype(jnp.int32).astype(F32) / F32(255.0)

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

    hi = h.astype(jnp.int32)
    si = s.astype(jnp.int32)
    vi = v.astype(jnp.int32)

    m = jnp.zeros(hi.shape, dtype=jnp.bool_)
    for mh, ms, mv in (
        C.ALPHA_MARKER_COLOR_HSV,
        C.BRAVO_MARKER_COLOR_HSV,
        C.CHARLIE_MARKER_COLOR_HSV,
    ):
        hue_ok = jnp.abs(hi - mh) <= C.FIND_MARKER_HSV_HUE_TOLERANCE
        sat_ok = jnp.abs(si - ms) <= C.FIND_MARKER_HSV_SAT_TOLERANCE
        arc_ok = (
            jnp.abs(si - (ms - C.FIND_MARKER_PLAYER_DIR_ARC_SAT))
            <= C.FIND_MARKER_HSV_SAT_TOLERANCE
        )
        vib_ok = jnp.abs(vi - mv) <= C.FIND_MARKER_HSV_VIB_TOLERANCE
        m = m | (hue_ok & (sat_ok | arc_ok) & vib_ok)
    m = m & (si >= C.FIND_MARKER_HSV_MIN_SAT)

    # L1 r=1 dilate: interior rows OR'd with their halo neighbours and
    # x-shifted selves. Lane shifts use pltpu.roll (Mosaic rejects offset
    # layouts from pad+slice along lanes) with the wrapped column masked off.
    inner = m[HALO : HALO + BAND_H, :]
    up = m[HALO - 1 : HALO - 1 + BAND_H, :]
    down = m[HALO + 1 : HALO + 1 + BAND_H, :]
    bw = inner.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, inner.shape, 1)
    # Mosaic's rotate only handles 32-bit lanes, and shifts must be
    # non-negative (bw-1 right-rotations == one left-rotation).
    inner_i = inner.astype(jnp.int32)
    left = (pltpu.roll(inner_i, 1, axis=1) > 0) & (col > 0)
    right = (pltpu.roll(inner_i, bw - 1, axis=1) > 0) & (col < bw - 1)
    d = inner | up | down | left | right

    # Bit-pack (MSB first, np.unpackbits order) as an MXU matmul: Mosaic
    # cannot reshape along the lane axis, but a [w, w/8] selector matrix
    # with weights 2^(7 - k%8) at rows k of column k//8 packs every byte in
    # one dot (values <= 255 are exact in f32).
    bh, bw = d.shape
    k = jax.lax.broadcasted_iota(jnp.int32, (bw, bw // 8), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bw, bw // 8), 1)
    sel = jnp.where(k // 8 == c, (1 << (7 - (k % 8))), 0).astype(F32)
    bits_f = jnp.dot(d.astype(F32), sel, preferred_element_type=F32)
    bits_ref[...] = bits_f.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mask_bits_pallas(map_rgb: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """map_rgb u8 [H, W, 3] -> bit-packed dilated marker mask u8 [H, W8/8].

    Pads to band/byte multiples; the padding rows/cols classify to False
    (black is never marker-colored), so edge semantics match the XLA path.
    """
    h, w = map_rgb.shape[:2]
    # Lane (width) padding to 128 keeps every DMA slice tile-aligned; the
    # pad columns classify to False so edge semantics are unchanged.
    w8 = ((w + 127) // 128) * 128
    hb = ((h + BAND_H - 1) // BAND_H) * BAND_H

    # HALO rows of zero padding on each side; zero cols on the right.
    planes = []
    for c in range(3):
        p = jnp.pad(map_rgb[..., c], ((HALO, HALO + hb - h), (0, w8 - w)))
        planes.append(p)

    # Halo'd input windows overlap between bands, which BlockSpec tiling
    # cannot express (index maps are in block units); the inputs therefore
    # stay in HBM and each program DMAs its own [band-1, band+BAND_H+1) rows
    # into VMEM scratch.
    grid = (hb // BAND_H,)
    bits = pl.pallas_call(
        _fused_mask_kernel_hbm,
        out_shape=jax.ShapeDtypeStruct((hb, w8 // 8), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BAND_H, w8 // 8), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((BAND_H + 2 * HALO, w8), jnp.uint8),
            pltpu.VMEM((BAND_H + 2 * HALO, w8), jnp.uint8),
            pltpu.VMEM((BAND_H + 2 * HALO, w8), jnp.uint8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(planes[0], planes[1], planes[2])
    return bits[:h, : (w + 7) // 8]


def _fused_mask_kernel_hbm(r_hbm, g_hbm, b_hbm, bits_ref, r_s, g_s, b_s, sems):
    """HBM-resident planes; each program DMAs its halo'd band into VMEM
    scratch (the pallas_guide double-buffer/async-copy pattern), then runs
    the fused classify/dilate/pack."""
    i = pl.program_id(0)
    row0 = i * BAND_H  # halo'd band starts at padded row i*BAND_H

    copies = []
    for src, dst, k in ((r_hbm, r_s, 0), (g_hbm, g_s, 1), (b_hbm, b_s, 2)):
        dma = pltpu.make_async_copy(
            src.at[pl.ds(row0, BAND_H + 2 * HALO), :], dst, sems.at[k]
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    _fused_mask_kernel(r_s, g_s, b_s, bits_ref)


# ---------------------------------------------------------------------------
# Quiet-walk kernel: the minimap finder's whole device half in ONE pass.
#
# XLA cannot be made to lower the low-edginess mask + its walk reductions
# efficiently: any vector-shaped reduction over the fused 8-neighbour
# edginess producer re-materializes the producer per reduce fusion (measured
# 25.9 ms vs 6 ms for the 4K fused pass with/without the quiet path; every
# reformulation tried — planar channels, u8 math, masked full-plane
# reductions, packed dual popcounts, optimization_barrier — still paid
# ~20 ms). This kernel reads the three channel planes once, computes the
# quiet mask band-by-band in VMEM, and reduces it to exactly what the walk
# needs: per-column AND over the two candidate row-runs + the centre row
# (packed into 3 bits of a [grid, 8, w] i32), and per-row AND over the two
# candidate column-runs + the centre column ([grid, BAND_H, 128] i32).
# The host-side walks then run on [w]/[h] vectors — trivial.
#
# Exactness: |a-b| summed over channels <= 7 is preserved by clamping each
# channel diff at 8 (any diff > 7 already fails; clamped sums stay in u8
# range but we stay in i32 anyway for pltpu.roll).
# ---------------------------------------------------------------------------


# Quiet bands are shorter than the mask kernel's: the SAD math lives in i32
# (pltpu.roll needs 32-bit lanes), and v5e scoped VMEM (16 MB) OOMs on
# 256-row i32 temporaries at 4K widths (measured: 29.4 MB stack).
QBAND_H = 64


def _quiet_walk_kernel_factory(h: int, w: int, w8: int):
    """Kernel over a BATCHED input [B, hb+2*HALO, w8] with grid (B, bands).

    The unbatched caller passes B=1. Batching lives in the kernel (2D grid +
    explicit batch indexing in the DMA slices) because vmap over a
    pallas_call with ANY-memory-space inputs is unsupported (Mosaic requires
    trivial block mappings for ANY)."""
    cy, cx = h // 2, w // 2
    lv = abs(h - cy) // 2 - 1  # vertical run length (left/right candidates)
    lh = abs(w - cx) // 2 - 1  # horizontal run length (up/down candidates)

    def kernel(r_hbm, g_hbm, b_hbm, colpack_ref, rowpack_ref, r_s, g_s, b_s, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        row0 = i * QBAND_H

        copies = []
        for src, dst, k in ((r_hbm, r_s, 0), (g_hbm, g_s, 1), (b_hbm, b_s, 2)):
            dma = pltpu.make_async_copy(
                src.at[b, pl.ds(row0, QBAND_H + 2 * HALO), :], dst, sems.at[k]
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        planes = [
            r_s[...].astype(jnp.int32),
            g_s[...].astype(jnp.int32),
            b_s[...].astype(jnp.int32),
        ]

        # SAD is symmetric: SAD(p, p+d) == SAD(q, q-d) at q = p+d, so the 8
        # neighbour terms are 4 forward SAD planes + 4 shifted views of the
        # same planes — half the abs-diff math and 12 rolls instead of 18.
        # Each forward plane is computed on an EXTENDED row range
        # [HALO-1, HALO+QBAND_H+1) so the reverse (row-shifted) view of the
        # band interior stays inside it. No clamp: channel diffs sum to
        # <= 765 in i32, and min(diff, 8) never changes (sad <= 7).
        EX = QBAND_H + 2  # extended rows: band + 1 row each side

        def sad_plane(dy, dx):
            """sad[r, c] = sum_ch |p[r, c] - p[r+dy, c+dx]| on extended rows."""
            sad = jnp.zeros((EX, w8), dtype=jnp.int32)
            for p in planes:
                a = p[HALO - 1 : HALO - 1 + EX, :]
                nb = p[HALO - 1 + dy : HALO - 1 + dy + EX, :]
                if dx:
                    nb = pltpu.roll(nb, (w8 - dx) % w8, axis=1)
                sad = sad + jnp.abs(a - nb)
            return sad

        quiet = jnp.ones((QBAND_H, w8), dtype=jnp.bool_)
        for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
            sad = sad_plane(dy, dx)
            ok = sad <= 7
            # forward term at the band interior (extended row 1 == band row 0)
            quiet = quiet & ok[1 : 1 + QBAND_H, :]
            # reverse term: ok at p-d (row shift via the extended range,
            # column shift via one roll of the BOOL plane through i32)
            rev = ok[1 - dy : 1 - dy + QBAND_H, :]
            if dx:
                rev_i = pltpu.roll(rev.astype(jnp.int32), dx % w8, axis=1)
                rev = rev_i > 0
            quiet = quiet & rev

        # Borders: the 1-px frame is never quiet (edge pixels have no full
        # 8-neighbourhood); padded rows/cols neither. Absolute coordinates.
        rows_abs = i * QBAND_H + jax.lax.broadcasted_iota(jnp.int32, (QBAND_H, w8), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (QBAND_H, w8), 1)
        quiet = quiet & (rows_abs >= 1) & (rows_abs <= h - 2)
        quiet = quiet & (cols >= 1) & (cols <= w - 2)
        qi = quiet.astype(jnp.int32)

        # Column-run partials: AND over this band's rows within each
        # candidate row range (outside rows contribute the AND identity).
        def col_all(lo, hi):
            inside = (rows_abs >= lo) & (rows_abs < hi)
            return jnp.min(jnp.where(inside, qi, 1), axis=0)  # [w8]

        pa = col_all(cy + 1, cy + 1 + lv)  # run downward (left candidate)
        pb = col_all(cy - lv, cy)  # run upward (right candidate)
        pc = col_all(cy, cy + 1)  # centre row
        colpack = pa + 2 * pb + 4 * pc
        colpack_ref[...] = jnp.broadcast_to(colpack[None, None, None, :], colpack_ref.shape)

        # Row-run partials: AND over each candidate column range per row.
        def row_all(lo, hi):
            inside = (cols >= lo) & (cols < hi)
            return jnp.min(jnp.where(inside, qi, 1), axis=1)  # [QBAND_H]

        ra = row_all(cx + 1, cx + 1 + lh)  # run rightward (top candidate)
        rb = row_all(cx - lh, cx)  # run leftward (bottom candidate)
        rc = row_all(cx, cx + 1)  # centre column
        rowpack = ra + 2 * rb + 4 * rc
        rowpack_ref[...] = jnp.broadcast_to(rowpack[None, None, :, None], rowpack_ref.shape)

    return kernel


def _rect_pallas_batched(
    p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray, interpret: bool
) -> jnp.ndarray:
    """Channel planes u8 [B, H, W] x3 -> i32 [B, 4] minimap rects (one
    kernel launch, grid (B, bands)). Plane inputs: an interleaved map would
    force a planarizing layout copy before the pad (SAD sums channels, so
    the plane order is irrelevant)."""
    from . import pipeline as _pl

    bsz, h, w = p0.shape
    w8 = ((w + 127) // 128) * 128
    hb = ((h + QBAND_H - 1) // QBAND_H) * QBAND_H
    grid_n = hb // QBAND_H

    planes = [
        jnp.pad(p, ((0, 0), (HALO, HALO + hb - h), (0, w8 - w)))
        for p in (p0, p1, p2)
    ]

    colpack, rowpack = pl.pallas_call(
        _quiet_walk_kernel_factory(h, w, w8),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, grid_n, 8, w8), jnp.int32),
            jax.ShapeDtypeStruct((bsz, grid_n, QBAND_H, 128), jnp.int32),
        ),
        grid=(bsz, grid_n),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 8, w8), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, QBAND_H, 128), lambda b, i: (b, i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((QBAND_H + 2 * HALO, w8), jnp.uint8),
            pltpu.VMEM((QBAND_H + 2 * HALO, w8), jnp.uint8),
            pltpu.VMEM((QBAND_H + 2 * HALO, w8), jnp.uint8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(planes[0], planes[1], planes[2])

    # Column partials AND across bands — BITWISE (a min over the packed
    # values would let one band's set bit survive another band's clear bit);
    # row partials are disjoint per band (each absolute row lives in exactly
    # one program's block).
    import operator as _op
    from functools import reduce as _reduce

    cols = _reduce(_op.and_, [colpack[:, i, 0, :w] for i in range(grid_n)])  # [B, w]
    rows = rowpack[:, :, :, 0].reshape(bsz, -1)[:, :h]  # [B, h]

    cy, cx = h // 2, w // 2
    lv = abs(h - cy) // 2 - 1
    lh = abs(w - cx) // 2 - 1

    def unpack(v, bit):
        return ((v >> bit) & 1) == 1

    def bound_gate(vec, lo, hi, dim):
        """The walk's run-bound rule (see pipeline._minimap_rect)."""
        if hi <= lo:
            return jnp.ones_like(vec)
        if lo < 3 or (hi - 1) > dim - 3:
            return jnp.zeros_like(vec)
        return vec

    def one(cols_b, rows_b):
        down_run = bound_gate(unpack(cols_b, 0), cy + 1, cy + 1 + lv, h)
        up_run = bound_gate(unpack(cols_b, 1), cy - lv, cy, h)
        centre_row = unpack(cols_b, 2)
        right_run = bound_gate(unpack(rows_b, 0), cx + 1, cx + 1 + lh, w)
        left_run = bound_gate(unpack(rows_b, 1), cx - lh, cx, w)
        centre_col = unpack(rows_b, 2)
        return _pl._minimap_walks(
            centre_row & down_run,
            centre_row & up_run,
            centre_col & right_run,
            centre_col & left_run,
            h,
            w,
        )

    return jax.vmap(one)(cols, rows)


@functools.lru_cache(maxsize=4)
def _rect_pallas_vmappable(interpret: bool):
    """custom_vmap wrapper: a vmap over the single-map entry (the batched
    fused pass vmaps the per-frame pass) reroutes to the natively-batched
    kernel instead of trying to batch the pallas_call itself."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def rect(p0, p1, p2):
        return _rect_pallas_batched(p0[None], p1[None], p2[None], interpret)[0]

    @rect.def_vmap
    def _rect_vmap_rule(axis_size, in_batched, p0, p1, p2):
        assert all(in_batched), "custom_vmap rule called without batched operands"
        return _rect_pallas_batched(p0, p1, p2, interpret), True

    return rect


@functools.partial(jax.jit, static_argnames=("interpret",))
def minimap_rect_pallas(map_bgra: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """BGRA/BGR u8 [H, W, C] map ROI -> i32 [4] minimap rect (interleaved
    compatibility entry; see minimap_rect_pallas_planes)."""
    return minimap_rect_pallas_planes(
        map_bgra[..., 0], map_bgra[..., 1], map_bgra[..., 2], interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def minimap_rect_pallas_planes(
    p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Channel planes u8 [H, W] x3 -> i32 [4] minimap rect.

    Same result as _minimap_rect(_edgy_quiet(map)) (ops/pipeline.py), with
    the edginess + run reductions fused into one VMEM pass; only the
    [w]/[h]-vector walks remain in XLA. vmap-compatible via custom_vmap
    (batch callers get one launch with grid (B, bands))."""
    return _rect_pallas_vmappable(interpret)(p0, p1, p2)
