"""Frame sources + the capture thread with its one-deep frame mailbox.

The reference captures the game window with win32 PrintWindow/PlgBlt
(src/squadex/capture/windows.rs) — OS capture is out of scope on a TPU host,
so the framework exposes a FrameSource seam with file/directory/synthetic
sources (the reference's own test path: Fake Inputs, src/ui/debug.rs:46-82).

The capture thread semantics mirror /root/reference/src/capture.rs:8-95:
  * 20 Hz poll (CAPTURE_HZ),
  * crc32 dedup of identical frames,
  * a one-slot mailbox: the thread parks after delivering a frame and is
    unparked when the vision loop consumes it.
"""

from __future__ import annotations

import dataclasses
import itertools
import pathlib
import threading
import zlib
from typing import Iterator, Optional, Protocol

import numpy as np

from .. import consts as C


@dataclasses.dataclass
class Frame:
    image: np.ndarray  # BGRA u8 [H, W, 4]
    dpi: Optional[int] = None


class FrameSource(Protocol):
    def grab(self) -> Optional[Frame]:
        """Return the current frame (may be identical to the previous one)."""
        ...


class StaticSource:
    """Always returns the same frame (like Fake Input with one sample)."""

    def __init__(self, frame: np.ndarray, dpi: Optional[int] = None) -> None:
        self._frame = frame
        self._dpi = dpi

    def grab(self) -> Optional[Frame]:
        return Frame(self._frame, self._dpi)


class DirectorySource:
    """Cycles image files from a directory (PNG/JPG), BGRA-converted."""

    def __init__(self, path: str, dpi: Optional[int] = None) -> None:
        from PIL import Image

        self._images: list[np.ndarray] = []
        for p in sorted(pathlib.Path(path).iterdir()):
            if p.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            rgba = np.asarray(Image.open(p).convert("RGBA"))
            self._images.append(np.ascontiguousarray(rgba[..., [2, 1, 0, 3]]))
        if not self._images:
            raise ValueError(f"no images in {path}")
        self._iter: Iterator[np.ndarray] = itertools.cycle(self._images)
        self._dpi = dpi

    def grab(self) -> Optional[Frame]:
        return Frame(next(self._iter), self._dpi)


class BlackoutFallbackSource:
    """Primary/fallback source pair with blackout detection.

    Mirrors the reference's capture "Blackout" state machine
    (src/squadex/capture/windows.rs:9-47,148-158,274-278): when the primary
    source produces all-black frames (the DX12-fullscreen window-capture
    failure mode), switch to the fallback source; periodically re-probe the
    primary (the reference re-probes when the window handle changes; without
    window handles we re-probe every `reprobe_every` grabs).
    """

    def __init__(self, primary: FrameSource, fallback: FrameSource, reprobe_every: int = 60) -> None:
        self._primary = primary
        self._fallback = fallback
        self._reprobe_every = reprobe_every
        self._blackout = False
        self._since_probe = 0

    @staticmethod
    def _is_black(frame: Optional[Frame]) -> bool:
        if frame is None:
            return True
        return not frame.image[..., :3].any()

    def grab(self) -> Optional[Frame]:
        if self._blackout:
            self._since_probe += 1
            if self._since_probe >= self._reprobe_every:
                self._since_probe = 0
                probe = self._primary.grab()
                if not self._is_black(probe):
                    self._blackout = False
                    return probe
            return self._fallback.grab()

        frame = self._primary.grab()
        if self._is_black(frame):
            self._blackout = True
            self._since_probe = 0
            return self._fallback.grab()
        return frame


def load_frame_bgra(path: str) -> np.ndarray:
    """Load an image file as a BGRA frame array."""
    from PIL import Image

    rgba = np.asarray(Image.open(path).convert("RGBA"))
    return np.ascontiguousarray(rgba[..., [2, 1, 0, 3]])


class CaptureThread:
    """One-slot latest-frame mailbox fed by a FrameSource at CAPTURE_HZ."""

    def __init__(self, source: FrameSource, hz: float = float(C.CAPTURE_HZ)) -> None:
        self._source = source
        self._interval = 1.0 / hz
        self._cond = threading.Condition()
        self._slot: Optional[Frame] = None
        self._consumed = threading.Event()
        self._consumed.set()
        self._shutdown = threading.Event()
        self._last_crc = 0
        self._thread: Optional[threading.Thread] = None

    def fresh_frame(self) -> Optional[Frame]:
        """Take the mailbox frame if present; unparks the capture thread
        either way (capture.rs:15-22 unparks even when the slot is empty)."""
        with self._cond:
            frame = self._slot
            self._slot = None
        self._consumed.set()
        return frame

    def _run(self) -> None:
        while not self._shutdown.is_set():
            frame = self._source.grab()
            if frame is None:
                self._shutdown.wait(self._interval)
                continue
            crc = zlib.crc32(frame.image.tobytes())
            if crc == self._last_crc:
                self._shutdown.wait(self._interval)
                continue
            self._last_crc = crc
            # Clear BEFORE publishing: a consumer that takes the frame
            # between publish and wait would otherwise have its set() lost
            # and the capture thread would stall a tick.
            self._consumed.clear()
            with self._cond:
                self._slot = frame
            # Park until the vision loop consumes the frame (capture.rs:83).
            self._consumed.wait(timeout=1.0)

    def start(self) -> "CaptureThread":
        self._thread = threading.Thread(target=self._run, name="capture", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._shutdown.set()
        self._consumed.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
