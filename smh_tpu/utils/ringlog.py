"""In-memory ring-buffer log sink with repeat collapsing.

Counterpart of the reference's log window + "(xN)" dedup
(/root/reference/src/ui/logs.rs:22-144). Attach as a logging handler; the
buffer is exposed for any surface (CLI dump, web debug endpoint).
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import threading
import time
from typing import Optional


@dataclasses.dataclass
class LogEntry:
    ts: float
    level: int
    message: str
    count: int = 1  # collapsed repeats ("(xN)")


class RingLogHandler(logging.Handler):
    def __init__(self, capacity: int = 1000) -> None:
        super().__init__()
        self._entries: collections.deque[LogEntry] = collections.deque(maxlen=capacity)
        self._lock2 = threading.Lock()

    def emit(self, record: logging.LogRecord) -> None:
        try:
            msg = self.format(record)
        except Exception:
            return
        with self._lock2:
            if self._entries and self._entries[-1].message == msg and self._entries[-1].level == record.levelno:
                self._entries[-1].count += 1
                self._entries[-1].ts = time.time()
            else:
                self._entries.append(LogEntry(ts=time.time(), level=record.levelno, message=msg))

    def entries(self) -> list[LogEntry]:
        with self._lock2:
            return list(self._entries)

    def formatted(self) -> list[str]:
        out = []
        for e in self.entries():
            suffix = f" (x{e.count})" if e.count > 1 else ""
            out.append(f"{logging.getLevelName(e.level)} {e.message}{suffix}")
        return out


_default: Optional[RingLogHandler] = None


def install(capacity: int = 1000, level: int = logging.INFO) -> RingLogHandler:
    """Install a process-wide ring sink on the root logger."""
    global _default
    if _default is None:
        _default = RingLogHandler(capacity)
        _default.setLevel(level)
        _default.setFormatter(logging.Formatter("%(name)s: %(message)s"))
        logging.getLogger().addHandler(_default)
    return _default


def get() -> Optional[RingLogHandler]:
    return _default
