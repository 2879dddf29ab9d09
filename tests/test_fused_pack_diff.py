"""Fused native planarize+diff (smh_pack_diff) must be byte- and
index-identical to the two-pass path it replaces (cv2/_pack_rois_bgr pack,
then smh_diff_subchunks / the numpy two-level refine) — on odd shapes where
plane rows straddle the 32 B sub-chunk grid, and through the real
per-frame/batch transports.

Reference analog: the delta transport has no reference counterpart (the
reference re-uploads every frame, /root/reference/vision-gpu/src/lib.rs); the
invariant here is internal exactness of the host half.
"""

from __future__ import annotations

import numpy as np
import pytest

from smh_tpu import native
from smh_tpu.vision import tpu_backend as tb

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

rng = np.random.default_rng(42)


def _rois(fh, fw, mh, mw, bh, bw, mutate):
    frame = rng.integers(0, 256, (fh, fw, 4), dtype=np.uint8)
    frame2 = frame.copy()
    if mutate:
        ys, xs, n = mutate
        frame2[ys : ys + n, xs : xs + 2 * n] ^= rng.integers(
            1, 255, (n, 2 * n, 4), dtype=np.uint8
        )
    def views(f):
        return f[3 : 3 + mh, 2 : 2 + mw], f[0:bh, 0:bw]
    return views(frame), views(frame2)


@pytest.mark.parametrize(
    "mh,mw,bh,bw,mutate",
    [
        (97, 131, 10, 13, (5, 7, 4)),   # odd dims: rows straddle sub-chunks
        (64, 96, 8, 8, None),            # aligned, zero change
        (33, 31, 3, 5, (1, 0, 2)),       # mw < 32: pure scalar path
        (123, 257, 11, 17, (20, 40, 10)),
        (2, 640, 1, 1, (0, 0, 1)),       # wide rows, tiny button
    ],
)
def test_fused_matches_two_pass(mh, mw, bh, bw, mutate):
    (m1, b1), (m2, b2) = _rois(300, 700, mh, mw, bh, bw, mutate)
    p_base = tb._pack_rois_bgr(m1, b1, pad_to=tb._DELTA_CHUNK)
    p_ref = tb._pack_rois_bgr(m2, b2, pad_to=tb._DELTA_CHUNK)
    scratch = np.empty(p_base.size // 32, np.int32)
    n_ref = native.diff_subchunks(p_ref, p_base, scratch)
    idx_ref = scratch[:n_ref].copy()

    packed = np.empty_like(p_base)
    dirty = np.empty(p_base.size // 32, np.uint8)
    idx = np.empty(p_base.size // 32, np.int32)
    n = native.pack_diff(m2, b2, packed, p_base, dirty, idx)
    assert np.array_equal(packed, p_ref)
    assert n == n_ref
    assert np.array_equal(idx[:n], idx_ref)

    # The numpy two-level refine produces the same set (oracle of oracles).
    n_chunks = p_base.size // tb._DELTA_CHUNK
    ne = (
        p_ref.view(np.uint64).reshape(n_chunks, -1)
        != p_base.view(np.uint64).reshape(n_chunks, -1)
    )
    ch = np.flatnonzero(ne.any(axis=1)).astype(np.int32)
    ref32 = tb._refine_subchunks(ne, ch)
    if n_ref == 0:
        assert ref32.size == 1  # numpy path emits the no-op chunk 0
    else:
        assert np.array_equal(idx_ref, ref32)

    # Pack-only mode returns -1 and writes the identical bytes.
    packed2 = np.empty_like(p_base)
    assert native.pack_diff(m2, b2, packed2, None, None, None) == -1
    assert np.array_equal(packed2, p_ref)

    # In-place rolling mode: starting from the base's bytes, one call rolls
    # the buffer to the current frame with the identical index set (the
    # unchanged windows are compared but never stored).
    roll = p_base.copy()
    n_roll = native.pack_diff_roll(m2, b2, roll, dirty, idx)
    assert n_roll == n_ref
    assert np.array_equal(idx[:n_roll], idx_ref)
    assert np.array_equal(roll, p_ref)


def test_backend_fused_vs_twopass_uploads(monkeypatch):
    """The per-frame backend's pending upload (delta buffer or full pack)
    must be identical with the fused path on and off — and with the
    SMH_NATIVE_DIFF=0 debug hatch, which must force the numpy refine even
    while the native pack stays enabled (advisor r4: the hatch was silently
    dead under the fused sweep)."""
    monkeypatch.setenv("SMH_DELTA", "1")

    def run(fused: bool, native_diff: bool = True):
        monkeypatch.setenv("SMH_NATIVE_DIFF", "1" if native_diff else "0")
        monkeypatch.setenv("SMH_NATIVE_PACK", "1" if fused else "0")
        b = tb.TpuBackend(lsd_engine="native")
        pendings = []
        f0 = rng.integers(0, 256, (240, 320, 4), dtype=np.uint8)
        f1 = f0.copy()
        f1[100:120, 50:90] = 255
        # f2 exercises the IN-PLACE rolling path on the fused run: f1 rode
        # the delta transport, so its mirror is private and writable.
        f2 = f1.copy()
        f2[10:14, 200:260] = 7
        for f in (f0, f1, f2):
            b.load_frame(f)
            kind = b._pending[0]
            buf = b._pending[1]
            pendings.append((kind, buf.copy(), b._pending[2:]))
            # advance the chain without a device: dispatch is not needed for
            # the transport equality — emulate its mirror bookkeeping,
            # INCLUDING clearing _pending first (dispatch() pops it before
            # retiring the mirror; leaving it set makes load_frame's
            # poisoned-chain guard fire, which only real undispatched
            # loads should trigger — see test_inplace_roll_reseed below).
            b._resident = object()
            b._pending = None
            b._retire_mirror(recyclable_next=(kind == "delta"))
        return pendings

    rng_state = rng.bit_generator.state
    a = run(True)
    rng.bit_generator.state = rng_state
    c = run(False)
    rng.bit_generator.state = rng_state
    d = run(True, native_diff=False)  # numpy refine forced, pack native
    assert [x[0] for x in a] == [x[0] for x in c] == [x[0] for x in d]
    for (ka, ba, ta), (kc, bc, tc), (kd, bd, td) in zip(a, c, d):
        assert ta == tc == td
        assert np.array_equal(ba, bc), ka
        assert np.array_equal(ba, bd), ka


def _batch_skeleton(batch=4, w=320, h=240):
    from smh_tpu import consts as C
    from smh_tpu.vision.batch import BatchPipeline

    bp = BatchPipeline.__new__(BatchPipeline)
    bp.geom = C.map_geometry(w, h)
    bp.batch = batch
    bp._rois_buf = None
    bp._mirror = None
    bp._diff_scratch = None
    bp._dirty_scratch = None
    import smh_tpu.native as native_mod

    bp._native = native_mod
    from concurrent.futures import ThreadPoolExecutor

    bp._pool = ThreadPoolExecutor(max_workers=2)
    return bp


def test_batch_fused_pack_matches_pool_pack():
    bp = _batch_skeleton()
    frames = [
        rng.integers(0, 256, (240, 320, 4), dtype=np.uint8) for _ in range(3)
    ]
    ref = bp._pack_rois(frames).copy()
    bp._rois_buf = None
    fused, changed = bp._pack_rois_fused(frames, diff=False)
    assert changed is None
    assert np.array_equal(fused, ref)

    # diff=True against a chain: indices equal the sequential native diff.
    bp._mirror = ref[0].copy()
    bp._rois_buf = None
    fused2, changed2 = bp._pack_rois_fused(frames, diff=True)
    assert np.array_equal(fused2, ref)
    scratch = np.empty(ref.shape[1] // 32, np.int32)
    prev = bp._mirror
    for i in range(3):
        cnt = native.diff_subchunks(ref[i], prev, scratch)
        exp = np.zeros(1, np.int32) if cnt == 0 else scratch[:cnt]
        assert np.array_equal(changed2[i], exp), i
        prev = ref[i]
    bp._pool.shutdown()


def test_batch_roll_delta_matches_delta_updates():
    """The rolling in-place batch delta (_roll_delta) must produce the
    byte-identical (buf, bucket) of the two-pass _pack_rois+_delta_updates
    path, including partial batches (padding rows) and the no-change
    keepalive — and leave the mirror equal to the last frame's pack."""
    bp = _batch_skeleton(batch=4)
    base = rng.integers(0, 256, (240, 320, 4), dtype=np.uint8)
    # chain: base -> +patch A -> +patch B -> unchanged (no-op keepalive)
    frames = [base.copy() for _ in range(3)]
    frames[0][20:30, 40:80] ^= 0x3C
    frames[1] = frames[0].copy()
    frames[1][50:60, 100:140] ^= 0x5A
    frames[2] = frames[1].copy()

    def seed():
        return bp._pack_rois([base])[0].copy()

    bp._mirror = seed()
    rois = bp._pack_rois(frames).copy()
    exp = bp._delta_updates(rois, len(frames))
    assert exp is not None

    bp._mirror = seed()
    got = bp._roll_delta(frames)
    assert got is not None
    assert got[1] == exp[1]
    assert np.array_equal(got[0], exp[0])
    assert np.array_equal(bp._mirror, rois[len(frames) - 1])

    # Ladder overflow parity: a frame of noise must make BOTH paths bail.
    noisy = [rng.integers(0, 256, (240, 320, 4), dtype=np.uint8)]
    bp._mirror = seed()
    assert bp._delta_updates(bp._pack_rois(noisy).copy(), 1) is None
    bp._mirror = seed()
    assert bp._roll_delta(noisy) is None
    bp._pool.shutdown()
