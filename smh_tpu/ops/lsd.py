"""TPU longest-line search: 3600 rays, dense chunked scan, argmax reduce.

Replaces the reference's per-seed CUDA kernel (<<<8,450>>>, one thread per
0.1 degree, data-dependent while loop + block atomicMax/atomicCAS claim,
/root/reference/vision-gpu/cuda/cuda.cu:637-739 and vision-cpu/src/lib.rs:387-449)
with a TPU-shaped formulation:

  * every ray is a lane; positions along a ray are a dense step axis;
  * the gap state machine becomes a *run-length* computation: the march
    aborts at the first run of (max_gap+1) consecutive non-white samples,
    restoring the run's first position — computed with a cumulative max
    (last-white index) instead of sequential state;
  * rays off the image edge terminate by the convexity of the bounds
    (once out, always out), so "first out-of-bounds step" is also a scan;
  * the winning angle is a deterministic argmax (ties -> last, matching the
    reference fold's right-bias) instead of an atomicCAS race.

The step axis is processed in chunks inside a `lax.while_loop`; almost all
seeds resolve in one chunk (a ray dies after max_gap+1 = 16 steps of
background), so the common case is a single [3600, CHUNK] gather.

Positions use pos(k) = start + k*d in f32. The oracle accumulates d by
repeated addition; the two can differ by float ulps at cell boundaries, which
the detection thresholds absorb (validated by the parity suite).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import consts as C
from ..geometry import Line, Point

F32 = jnp.float32
I32 = jnp.int32

N_ANGLES = C.LSD_NUM_ANGLES
CHUNK = 256
_NEG_LARGE = jnp.int32(-(2**30))


@functools.partial(jax.jit, static_argnames=("h", "w", "max_gap", "max_k"))
def _march(mask: jnp.ndarray, pt: jnp.ndarray, h: int, w: int, max_gap: int, max_k: int):
    """mask: u8 [h, w]; pt: f32 [2]. Returns (end f32 [N,2], length_sqr f32 [N])."""
    n = N_ANGLES
    mask_flat = mask.reshape(-1)

    theta = (jnp.arange(n, dtype=F32) / F32(10.0)) * (F32(math.pi) / F32(180.0))
    dx = jnp.cos(theta)
    dy = jnp.sin(theta)

    x_start = pt[0]
    y_start = pt[1]

    run_limit = jnp.int32(max_gap + 1)

    def chunk_body(state):
        k0, done, lw, end_x, end_y = state

        ks = k0 + jax.lax.broadcasted_iota(I32, (1, CHUNK), 1)  # [1, CHUNK]
        kf = ks.astype(F32)
        px = x_start + dx[:, None] * kf  # [n, CHUNK]
        py = y_start + dy[:, None] * kf

        inb = (px >= 0) & (py >= 0) & (px < F32(w)) & (py < F32(h))
        xi = jnp.clip(px.astype(I32), 0, w - 1)
        yi = jnp.clip(py.astype(I32), 0, h - 1)
        lin = yi * w + xi
        white = (jnp.take(mask_flat, lin.reshape(-1), mode="clip").reshape(n, CHUNK) == 255) & inb

        kg = jnp.broadcast_to(ks, (n, CHUNK))
        # last-white global index up to k (carried across chunks via lw)
        lw_local = jnp.where(white, kg, _NEG_LARGE)
        lw_cum = jax.lax.associative_scan(jnp.maximum, lw_local, axis=1)
        lw_all = jnp.maximum(lw_cum, lw[:, None])

        run = kg - lw_all  # consecutive non-white steps ending at k (incl. k)
        abort_hit = (run >= run_limit) & inb
        oob_hit = ~inb

        abort_any = abort_hit.any(axis=1)
        oob_any = oob_hit.any(axis=1)

        ka_rel = jnp.argmax(abort_hit, axis=1)  # first True (or 0 if none)
        ko_rel = jnp.argmax(oob_hit, axis=1)

        # Abort: restore the first pixel of the failed run; the endpoint is
        # one step before it (vision-cpu:407-410,426-429 -- the restored
        # pixel is non-white, i.e. 0 in the binary mask, so the final check
        # always subtracts one step).
        lw_at_abort = jnp.take_along_axis(lw_all, ka_rel[:, None], axis=1)[:, 0]
        ks_end = (lw_at_abort + 1 - 1).astype(F32)  # run start minus one step
        abort_end_x = x_start + dx * ks_end
        abort_end_y = y_start + dy * ks_end

        # Out-of-bounds exit: final positional check with Rust's saturating
        # f32->u32 cast (negatives clamp to column/row 0).
        fx = jnp.take_along_axis(px, ko_rel[:, None], axis=1)[:, 0]
        fy = jnp.take_along_axis(py, ko_rel[:, None], axis=1)[:, 0]
        cxi = jnp.maximum(fx, F32(0.0)).astype(I32)
        cyi = jnp.maximum(fy, F32(0.0)).astype(I32)
        final_inb = (cxi < w) & (cyi < h)
        fpix = jnp.take(mask_flat, jnp.clip(cyi, 0, h - 1) * w + jnp.clip(cxi, 0, w - 1), mode="clip")
        final_black = final_inb & (fpix == 0)
        oob_end_x = jnp.where(final_black, fx - dx, x_start)
        oob_end_y = jnp.where(final_black, fy - dy, y_start)

        act = ~done
        finish_abort = act & abort_any
        finish_oob = act & ~abort_any & oob_any

        end_x = jnp.where(finish_abort, abort_end_x, jnp.where(finish_oob, oob_end_x, end_x))
        end_y = jnp.where(finish_abort, abort_end_y, jnp.where(finish_oob, oob_end_y, end_y))
        done = done | finish_abort | finish_oob
        lw = jnp.where(done, lw, lw_all[:, -1])

        return (k0 + CHUNK, done, lw, end_x, end_y)

    def cond(state):
        k0, done, *_ = state
        return (k0 < max_k) & ~done.all()

    init = (
        jnp.int32(0),
        jnp.zeros(n, dtype=bool),
        jnp.full(n, -1, dtype=I32),  # "pixel before the start was white"
        jnp.full(n, x_start, dtype=F32),
        jnp.full(n, y_start, dtype=F32),
    )
    _, done, _, end_x, end_y = jax.lax.while_loop(cond, chunk_body, init)

    # Lanes that somehow never finished (max_k is sized so this cannot
    # happen) keep their zero-length default.
    lengths = (x_start - end_x) ** 2 + (y_start - end_y) ** 2
    return jnp.stack([end_x, end_y], axis=1), lengths


def _max_k(h: int, w: int) -> int:
    diag = int(math.ceil(math.hypot(h, w))) + 2
    return ((diag + CHUNK - 1) // CHUNK) * CHUNK


def find_longest_line_device(mask_dev: jax.Array, pt: Point, max_gap: float):
    """Run the march on-device; returns (ends [N,2], lengths [N]) device arrays."""
    h, w = mask_dev.shape
    ptv = jnp.array([pt.x, pt.y], dtype=jnp.float32)
    return _march(mask_dev, ptv, h=h, w=w, max_gap=int(max_gap), max_k=_max_k(h, w))


def find_longest_line(mask_dev: jax.Array, pt: Point, max_gap: float) -> tuple[Line, float]:
    """Host-facing wrapper: longest segment from `pt` (ties -> last angle)."""
    ends, lengths = find_longest_line_device(mask_dev, pt, max_gap)
    lengths_np = jax.device_get(lengths)
    ends_np = jax.device_get(ends)
    best = len(lengths_np) - 1 - int(lengths_np[::-1].argmax())
    line = Line(Point(float(pt.x), float(pt.y)), Point(float(ends_np[best, 0]), float(ends_np[best, 1])))
    return line, float(lengths_np[best])
