"""Native delta-diff engine vs the numpy two-level refine: identical output.

The delta transport's correctness rests on the diff emitting EXACTLY the
differing 32 B sub-chunks (reconstruction is a scatter of those chunks);
this pins the native engine (smhnative.cpp smh_diff_subchunks /
smh_gather_subchunks) against the numpy reference formulation on
randomized buffers, including the all-equal and everything-changed edges.
"""

import numpy as np
import pytest

from smh_tpu import native
from smh_tpu.vision.tpu_backend import (
    _DELTA_CHUNK,
    _DELTA_SUB,
    _refine_subchunks,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def numpy_changed32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n_chunks = a.size // _DELTA_CHUNK
    ne = a.view(np.uint64).reshape(n_chunks, -1) != b.view(np.uint64).reshape(
        n_chunks, -1
    )
    changed = np.flatnonzero(ne.any(axis=1)).astype(np.int32)
    return _refine_subchunks(ne, changed)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_bytes", [_DELTA_CHUNK, 4096, 128 * 1024])
def test_diff_matches_numpy_refine(seed, n_bytes):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, n_bytes, dtype=np.uint8)
    b = a.copy()
    # mutate random spans (byte-level, crossing sub-chunk boundaries)
    for _ in range(rng.integers(1, 20)):
        off = int(rng.integers(0, n_bytes))
        ln = int(rng.integers(1, 200))
        b[off : off + ln] ^= np.uint8(0x5A)
    scratch = np.empty(n_bytes // _DELTA_SUB, np.int32)
    n = native.diff_subchunks(b, a, scratch)
    got = scratch[:n]
    want = numpy_changed32(b, a)
    # numpy refine returns [0] for the no-change case; the native engine
    # returns 0 and the caller substitutes — normalize for comparison
    if want.size == 1 and want[0] == 0 and n == 0:
        return
    assert np.array_equal(got, want), (got, want)


def test_diff_edges():
    a = np.zeros(_DELTA_CHUNK * 4, np.uint8)
    scratch = np.empty(a.size // _DELTA_SUB, np.int32)
    # all equal
    assert native.diff_subchunks(a, a.copy(), scratch) == 0
    # everything changed
    b = a ^ np.uint8(0xFF)
    n = native.diff_subchunks(b, a, scratch)
    assert n == a.size // _DELTA_SUB
    assert np.array_equal(scratch[:n], np.arange(n, dtype=np.int32))
    # a single byte at the very end
    c = a.copy()
    c[-1] = 1
    n = native.diff_subchunks(c, a, scratch)
    assert n == 1 and scratch[0] == a.size // _DELTA_SUB - 1


def test_gather_matches_numpy_layout():
    rng = np.random.default_rng(9)
    packed = rng.integers(0, 256, 64 * _DELTA_SUB, dtype=np.uint8)
    idx = np.array([3, 7, 8, 41], dtype=np.int32)
    bucket = 8
    out = np.empty(bucket * 4 + bucket * _DELTA_SUB, np.uint8)
    native.gather_subchunks(packed, idx, idx.size, bucket, out)
    got_idx = out[: bucket * 4].view(np.int32)
    assert list(got_idx) == [3, 7, 8, 41, 41, 41, 41, 41]
    data = out[bucket * 4 :].reshape(bucket, _DELTA_SUB)
    chunks = packed.reshape(-1, _DELTA_SUB)
    for i, k in enumerate(got_idx):
        assert np.array_equal(data[i], chunks[k])
