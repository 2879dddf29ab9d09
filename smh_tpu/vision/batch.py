"""Batched frame pipeline: throughput mode.

Processes B frames per device dispatch with ONE host fetch for the whole
batch — on a latency-bound host link the per-frame roundtrip cost divides by
B. This is the BASELINE "streaming capture loop / batched frames" config and
the offline-analysis API (video files, multiple game clients). Detection
semantics are identical to the per-frame driver: the host stages (LSD scan,
minimap walk, scale bars) run per frame on the fetched masks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from .. import consts as C
from ..geometry import Line, Rect
from ..ops import pipeline as ops_pipeline
from . import find_minimap as fm
from . import lsd as vlsd
from . import mpx_ratio as mpx
from .reference import find_longest_line as oracle_march


@dataclasses.dataclass
class BatchResult:
    sleeping: bool
    markers: list[Line]
    minimap_bounds: Optional[Rect]
    meters_to_px_ratio: Optional[float]


class BatchPipeline:
    """Fixed-resolution batched analyzer (one jit bucket per (res, B))."""

    def __init__(self, frame_w: int, frame_h: int, batch: int = 8, ocr_engine=None) -> None:
        self.geom = C.map_geometry(frame_w, frame_h)
        self.batch = batch
        self.ocr_engine = ocr_engine
        from .. import native

        self._native = native if native.available() else None

    def _pack_rois(self, frames: list[np.ndarray]) -> np.ndarray:
        g = self.geom
        roi_bytes = g.map_h * g.map_w * 4 + g.btn_h * g.btn_w * 4
        out = np.empty((len(frames), roi_bytes), dtype=np.uint8)
        for i, f in enumerate(frames):
            m = f[g.map_y : g.map_y + g.map_h, g.map_x : g.map_x + g.map_w]
            b = f[g.btn_y : g.btn_y + g.btn_h, g.btn_x : g.btn_x + g.btn_w]
            out[i, : m.size] = m.reshape(-1)
            out[i, m.size :] = b.reshape(-1)
        return out

    def process(self, frames: list[np.ndarray]) -> list[BatchResult]:
        """frames: BGRA u8 arrays of the pipeline resolution, len <= batch."""
        g = self.geom
        assert frames and len(frames) <= self.batch
        n = len(frames)
        rois = self._pack_rois(frames)
        if n < self.batch:
            rois = np.concatenate([rois, np.zeros((self.batch - n, rois.shape[1]), np.uint8)])

        with_ocr = self.ocr_engine is not None
        out = ops_pipeline._analyze_batch_packed(
            jax.device_put(rois),
            map_h=g.map_h,
            map_w=g.map_w,
            btn_h=g.btn_h,
            btn_w=g.btn_w,
            grayscale=True,
            with_ocr=with_ocr,
        )
        packs = np.asarray(out["hostpack"])  # ONE fetch for the whole batch
        layout = ops_pipeline.hostpack_layout(g.map_h, g.map_w, with_ocr=with_ocr)

        results: list[BatchResult] = []
        mask_row = (g.map_w + 7) // 8
        for i in range(n):
            pack = packs[i]

            def sect(name):
                off, size = layout[name]
                return pack[off : off + size]

            red = float(sect("red_ratio").view(np.float32)[0])
            if red < C.CLOSE_DEPLOYMENT_BUTTON_RED_PIXEL_THRESHOLD:
                results.append(BatchResult(True, [], None, None))
                continue

            lsd_mask = (
                ops_pipeline.unpack_bits_host(
                    sect("lsd_bits").reshape(g.map_h, mask_row), g.map_w
                )
                * np.uint8(255)
            )
            if self._native is not None:
                markers = self._native.find_lines(lsd_mask, C.LSD_MAX_GAP)
            else:
                markers = vlsd.find_lines(lsd_mask, C.LSD_MAX_GAP, oracle_march)

            quiet = ops_pipeline.unpack_bits_host(
                sect("quiet_bits").reshape(g.map_h, mask_row), g.map_w
            ).astype(bool)
            minimap = fm.find_minimap_quiet(quiet)

            ratio = None
            if with_ocr:
                brq_row = (g.brq_w + 7) // 8
                ocr_img = sect("ocr_img").reshape(g.brq_h, g.brq_w)
                ocr_results = self.ocr_engine.read(ocr_img, None)
                from .pipeline import _parse_scales

                scales, start_y = _parse_scales(ocr_results)
                if scales and start_y is not None:
                    scales_img = ops_pipeline.unpack_bits_host(
                        sect("scales_bits").reshape(g.brq_h, brq_row), g.brq_w
                    ) * np.uint8(255)
                    ratio = mpx.calc_meters_to_px_ratio(scales, scales_img)

            results.append(BatchResult(False, markers, minimap, ratio))

        return results
