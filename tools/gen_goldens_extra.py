"""Generate the round-4 golden sets the base corpus lacks:

  tests/goldens/detections_4k.json   oracle detections on a 4K STRESS corpus
      built by nearest-neighbour-upscaling reference screenshots (provenance:
      the reference ships no 4K captures; NEAREST keeps every pixel an exact
      original game color — see smh_tpu.testing.upscale_frame). Includes the
      adversarial frames (difficult.png, whiteout.png, snowpoints.png with
      its 24 dense lines) so the 4K sparse-budget behaviour is pinned on
      real content, not synthetic benches.

  tests/goldens/video_1080p.json     oracle per-frame detections over the
      deterministic synthetic video sequence (testing.make_video_frames) the
      batch delta chain is benched with — the video-golden test drives
      BatchPipeline.stream() over the same frames and must reproduce these.

Regenerate with: python tools/gen_goldens_extra.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from smh_tpu import testing  # noqa: E402
from smh_tpu.squadex.capture import load_frame_bgra  # noqa: E402
from smh_tpu.vision.reference import ReferenceBackend  # noqa: E402

SAMPLES = pathlib.Path("/root/reference/vision-common/samples")
GOLDENS_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"

# 4K stress set: marker-rich + the adversarial trio + a sleeping control.
UPSCALE_4K = [
    "points.png",
    "points_intersect.png",
    "snowpoints.png",  # 24 lines at 1440p: the dense sparse-budget case
    "difficult.png",
    "whiteout.png",
    "in_mortar.png",
    "glorious.png",
    "full.jpg",  # 28 lines
]

VIDEO_W, VIDEO_H, VIDEO_N = 1920, 1080, 24


def oracle_detect(frame) -> dict:
    be = ReferenceBackend()
    be.load_frame(frame)
    cropped = be.crop_to_map(grayscale=True)
    if cropped is None:
        return {"sleeping": True}
    be.isolate_map_markers()
    be.mask_marker_lines()
    lines = be.find_marker_lines(15)
    return {
        "sleeping": False,
        "mask_px": int((be.lsd_image == 255).sum()),
        "lines": [
            [round(l.p0.x, 3), round(l.p0.y, 3), round(l.p1.x, 3), round(l.p1.y, 3)]
            for l in lines
        ],
    }


def main() -> None:
    goldens_4k = {}
    for name in UPSCALE_4K:
        t0 = time.time()
        frame = testing.upscale_frame(load_frame_bgra(str(SAMPLES / name)), 3840, 2160)
        entry = oracle_detect(frame)
        entry["provenance"] = "nearest-upscaled from vision-common/samples"
        goldens_4k[name] = entry
        print(
            f"4k {name}: {len(entry.get('lines', []))} lines, "
            f"mask_px={entry.get('mask_px')} ({time.time()-t0:.1f}s)"
        )
    out = GOLDENS_DIR / "detections_4k.json"
    out.write_text(json.dumps(goldens_4k, indent=1, sort_keys=True))
    print(f"wrote {out}")

    video = []
    for i, frame in enumerate(testing.make_video_frames(VIDEO_W, VIDEO_H, VIDEO_N)):
        t0 = time.time()
        entry = oracle_detect(frame)
        entry.pop("mask_px", None)
        video.append(entry)
        print(f"video {i}: {len(entry.get('lines', []))} lines ({time.time()-t0:.1f}s)")
    out = GOLDENS_DIR / "video_1080p.json"
    out.write_text(json.dumps(
        {"w": VIDEO_W, "h": VIDEO_H, "n": VIDEO_N, "frames": video},
        indent=1,
    ))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
