"""TPU vision backend: the production counterpart of the numpy oracle.

Implements the same backend contract as ReferenceBackend (mirroring the
`Vision` trait, /root/reference/vision-common/src/lib.rs:30-61) on top of the
fused JAX ops in smh_tpu.ops. Where the reference GPU backend launches one
CUDA kernel per stage across 4 streams (vision-gpu/src/lib.rs:207-479), this
backend runs the entire elementwise DAG in ONE jitted dispatch when
crop_to_map is called; the later stage methods only fetch cached results, so
the trait-shaped API is preserved without giving up fusion.

Host<->device traffic (the H2D/D2H boundaries of SURVEY.md section 3.1):
  * one H2D per frame (device_put of the BGRA frame);
  * D2H of ui_map (for the UI), lsd_mask (for the host seed scan), ocr_img
    (for Tesseract) and scales_bin (for the scale-bar scan) — the same four
    transfers the reference performs with pinned buffers
    (vision-gpu/src/gpuimage.rs:117-167).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .. import consts as C
from ..geometry import Line, Point
from ..ops import lsd as ops_lsd
from ..ops import pipeline as ops_pipeline
from . import lsd
from .reference import DebugView


class TpuBackend:
    name = "tpu"

    def __init__(self, lsd_engine: str = "auto") -> None:
        """lsd_engine: "native" (C++ host march), "tpu" (batched device
        march), or "auto" (native when the toolchain built it, else tpu).
        Both reproduce the oracle's semantics; native is the faster host path
        for this scalar-chasing workload (SURVEY.md section 7 "hard parts")."""
        self.frame_np: Optional[np.ndarray] = None
        self.rois_dev: Optional[jax.Array] = None  # packed map+btn ROI upload
        self.geom: Optional[C.MapGeometry] = None
        self._results: Optional[dict] = None
        self._lsd_mask_host: Optional[np.ndarray] = None
        self._debug = False
        self._grayscale = True
        self._dispatch_flags: tuple = (True, True, True)
        self._host: Optional[dict] = None  # parsed hostpack sections
        self._ui_check: Optional[tuple] = None
        self._ui_map_cache: Optional[np.ndarray] = None
        # The driver disables this when a heightmap supplies distances or no
        # OCR engine exists: the OCR image then never leaves the device.
        self.scales_enabled = True
        # Minimap quiet mask cadence: the driver may skip it on frames where
        # it reuses cached minimap bounds (bounds only move on zoom changes).
        self.quiet_enabled = True
        if lsd_engine == "auto":
            from .. import native

            lsd_engine = "native" if native.available() else "tpu"
        self.lsd_engine = lsd_engine

    def set_debug(self, enabled: bool) -> None:
        """When enabled, the fused pass also materializes the intermediate
        images served by get_debug_view (costs extra D2H bandwidth)."""
        self._debug = enabled

    # -- lifecycle -----------------------------------------------------------

    def thread_ctx(self) -> None:
        """No-op: JAX owns device contexts (the reference needed per-thread
        CUDA context binding, vision-gpu/src/cuda.rs:5-13)."""

    def load_frame(self, frame_bgra: np.ndarray) -> None:
        assert frame_bgra.dtype == np.uint8 and frame_bgra.shape[2] == 4
        h, w = frame_bgra.shape[:2]
        if self.geom is None or (self.geom.frame_w, self.geom.frame_h) != (w, h):
            self.geom = C.map_geometry(w, h)
        g = self.geom
        self.frame_np = frame_bgra
        # Upload only the ROIs the pipeline reads (map + close-button), as
        # ONE flat buffer: ~2.3x less H2D than the whole frame, and a single
        # latency-bound transfer instead of two.
        map_roi = frame_bgra[g.map_y : g.map_y + g.map_h, g.map_x : g.map_x + g.map_w]
        btn_roi = frame_bgra[g.btn_y : g.btn_y + g.btn_h, g.btn_x : g.btn_x + g.btn_w]
        packed = np.empty(map_roi.size + btn_roi.size, dtype=np.uint8)
        packed[: map_roi.size] = map_roi.reshape(-1)
        packed[map_roi.size :] = btn_roi.reshape(-1)
        self.rois_dev = jax.device_put(packed)
        self._results = None
        self._host = None
        self._lsd_mask_host = None

    def get_cpu_frame(self) -> np.ndarray:
        assert self.frame_np is not None
        return self.frame_np

    # -- stages ---------------------------------------------------------------

    def dispatch(self, grayscale: Optional[bool] = None) -> None:
        """Launch the fused pass for the loaded frame (async: returns before
        the device finishes; the hostpack fetch in crop_to_map blocks).
        Separated from crop_to_map so a pipelined loop can overlap frame
        N+1's upload+dispatch with frame N's fetch + host stages."""
        assert self.rois_dev is not None and self.geom is not None
        if grayscale is not None:
            self._grayscale = grayscale
        g = self.geom
        self._dispatch_flags = (self.scales_enabled, self.quiet_enabled, self._grayscale)
        self._results = ops_pipeline._analyze_packed_flat(
            self.rois_dev,
            map_h=g.map_h,
            map_w=g.map_w,
            btn_h=g.btn_h,
            btn_w=g.btn_w,
            grayscale=self._grayscale,
            with_ocr=self.scales_enabled,
            with_quiet=self.quiet_enabled,
        )

    def snapshot_job(self) -> dict:
        """Capture the in-flight frame's device state so another frame can be
        loaded while this one is still being consumed (pipelined loop)."""
        return {
            "rois_dev": self.rois_dev,
            "results": self._results,
            "geom": self.geom,
            "frame_np": self.frame_np,
            "flags": self._dispatch_flags,
        }

    def adopt_job(self, job: dict) -> None:
        self.rois_dev = job["rois_dev"]
        self._results = job["results"]
        self.geom = job["geom"]
        self.frame_np = job["frame_np"]
        # Restore BOTH the flag attributes and the dispatch-time flags the
        # hostpack was packed with (crop_to_map slices by _dispatch_flags;
        # a later submit may have overwritten them with the next frame's).
        self._dispatch_flags = job["flags"]
        self.scales_enabled, self.quiet_enabled, self._grayscale = job["flags"]
        self._host = None
        self._lsd_mask_host = None

    def crop_to_map(self, grayscale: bool) -> Optional[tuple[np.ndarray, tuple[int, int, int, int]]]:
        assert self.rois_dev is not None and self.geom is not None
        g = self.geom

        # ONE dispatch, ONE device->host fetch: the packed buffer carries the
        # red gate, ui checksum, all bit-masks and the OCR image. (The fetch
        # latency, ~25 ms on this relay, dominates any payload size, so the
        # reference's "gate first, then compute" order inverts: computing the
        # sleeping frame costs ~0.5 ms of device time and saves a roundtrip.)
        if self._results is None or self._grayscale != grayscale:
            self._grayscale = grayscale
            self.dispatch()
        with_ocr, with_quiet, _ = self._dispatch_flags
        pack = np.asarray(self._results["hostpack"])
        layout = ops_pipeline.hostpack_layout(
            g.map_h, g.map_w, with_ocr=with_ocr, with_quiet=with_quiet
        )

        def sect(name):
            off, size = layout[name]
            return pack[off : off + size]

        red_ratio = float(sect("red_ratio").view(np.float32)[0])
        if red_ratio < C.CLOSE_DEPLOYMENT_BUTTON_RED_PIXEL_THRESHOLD:
            return None

        mask_row = (g.map_w + 7) // 8
        brq_row = (g.brq_w + 7) // 8
        self._host = {
            "ui_check": tuple(int(v) for v in sect("ui_check").view(np.uint32)),
            "lsd_bits": sect("lsd_bits").reshape(g.map_h, mask_row),
        }
        if with_quiet:
            self._host["quiet_bits"] = sect("quiet_bits").reshape(g.map_h, mask_row)
        if with_ocr:
            self._host["scales_bits"] = sect("scales_bits").reshape(g.brq_h, brq_row)
            self._host["ocr_img"] = sect("ocr_img").reshape(g.brq_h, g.brq_w)
        if self._debug:
            # Debug views want the extra intermediates: run the full-output
            # pass too (debug mode trades speed for visibility).
            map_dev = self.rois_dev[: g.map_h * g.map_w * 4].reshape(g.map_h, g.map_w, 4)
            self._results.update(
                ops_pipeline.analyze_map(map_dev, grayscale=grayscale, with_isolated=True)
            )

        # The ui map is display-only — it is NOT on the frame->markers+scales
        # critical path, and D2H is the scarcest resource on this host link
        # (~20 MB/s). crop_to_map therefore returns a lazy fetcher: the UI /
        # web layer materializes it when it actually wants pixels, and an
        # unchanged device-side checksum reuses the previous host copy
        # (the reference skips texture uploads with a host crc32 the same
        # way, src/ui/map.rs:222-233).
        results = self._results
        ui_check_host = self._host["ui_check"]

        def fetch_ui_map() -> np.ndarray:
            check = (*ui_check_host, grayscale)
            if (
                self._ui_map_cache is not None
                and check == self._ui_check
                and self._ui_map_cache.shape[:2] == (g.map_h, g.map_w)
            ):
                return self._ui_map_cache
            ui = np.asarray(results["ui"])
            ui_map = np.empty((g.map_h, g.map_w, 4), dtype=np.uint8)
            if ui.ndim == 2:
                ui_map[..., 0] = ui_map[..., 1] = ui_map[..., 2] = ui
            else:
                ui_map[..., :3] = ui
            ui_map[..., 3] = 255
            self._ui_check = check
            self._ui_map_cache = ui_map
            return ui_map

        return fetch_ui_map, (g.map_x, g.map_y, g.map_w, g.map_h)

    def minimap_quiet_map(self) -> Optional[np.ndarray]:
        """Low-edginess mask from the fused pass (find_minimap fast path)."""
        if self._host is None or self.geom is None or "quiet_bits" not in self._host:
            return None
        return ops_pipeline.unpack_bits_host(self._host["quiet_bits"], self.geom.map_w).astype(bool)

    def ocr_preprocess(self) -> np.ndarray:
        assert self._host is not None
        return self._host["ocr_img"]

    def scales_fingerprint(self) -> Optional[int]:
        """crc32 of the binarized scales plane: the ratio result depends on
        this image too, so the driver's OCR-result cache keys on it."""
        import zlib

        if self._host is None or "scales_bits" not in self._host:
            return None
        return zlib.crc32(self._host["scales_bits"].tobytes())

    def find_scales_preprocess(self, scales_start_y: int) -> np.ndarray:
        """Returns the binarized BRQ as 0/255 u8 (bit-unpacked)."""
        assert self._host is not None and self.geom is not None
        return ops_pipeline.unpack_bits_host(self._host["scales_bits"], self.geom.brq_w) * np.uint8(255)

    def isolate_map_markers(self) -> None:
        """Fused into the crop_to_map dispatch."""

    def mask_marker_lines(self) -> None:
        """Fused into the crop_to_map dispatch; unpacks the mask for the scan."""
        assert self._host is not None and self.geom is not None
        self._lsd_mask_host = (
            ops_pipeline.unpack_bits_host(self._host["lsd_bits"], self.geom.map_w) * np.uint8(255)
        )

    def find_longest_line(self, mask: np.ndarray, pt: Point, max_gap: float) -> tuple[Line, float]:
        assert self._results is not None
        return ops_lsd.find_longest_line(self._results["lsd_mask"], pt, max_gap)

    def _find_longest_lines_batch(self, mask: np.ndarray, pts: list[Point], max_gap: float):
        assert self._results is not None
        return ops_lsd.find_longest_lines_batch(self._results["lsd_mask"], pts, max_gap)

    def find_marker_lines(self, max_gap: int) -> list[Line]:
        if self._lsd_mask_host is None:
            self.mask_marker_lines()
        if self.lsd_engine == "native":
            from .. import native

            return native.find_lines(self._lsd_mask_host, max_gap)
        return lsd.find_lines(
            self._lsd_mask_host,
            max_gap,
            self.find_longest_line,
            find_longest_lines_batch=self._find_longest_lines_batch,
        )

    # -- debug ----------------------------------------------------------------

    def get_debug_view(self, choice: DebugView) -> Optional[np.ndarray]:
        if self._results is None or choice == DebugView.NONE:
            return None

        def gray_rgba(img: np.ndarray) -> np.ndarray:
            out = np.empty((*img.shape, 4), dtype=np.uint8)
            out[..., 0] = out[..., 1] = out[..., 2] = img
            out[..., 3] = 255
            return out

        def rgb_rgba(img: np.ndarray) -> np.ndarray:
            out = np.empty((*img.shape[:2], 4), dtype=np.uint8)
            out[..., :3] = img
            out[..., 3] = 255
            return out

        if choice == DebugView.OCR_INPUT:
            if self._host is None:
                return None
            return gray_rgba(self._host["ocr_img"])
        if choice == DebugView.FIND_SCALES_INPUT:
            return gray_rgba(self.find_scales_preprocess(0))
        if choice == DebugView.LSD_INPUT:
            if self._lsd_mask_host is None:
                self.mask_marker_lines()
            return gray_rgba(self._lsd_mask_host)
        if choice == DebugView.LSD_PREPROCESS and "isolated_map" in self._results:
            return rgb_rgba(np.asarray(self._results["isolated_map"]))
        if choice == DebugView.CROPPED_BRQ and "cropped_brq" in self._results:
            return rgb_rgba(np.asarray(self._results["cropped_brq"]))
        return None
