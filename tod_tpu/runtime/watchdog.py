"""Failure detection: a frame-progress watchdog.

The reference has no failure handling at all — ``expect``/``unwrap`` fail-fast
everywhere (SURVEY.md §5 "Failure detection": src/yolact.rs:20,27,35,
src/scene.rs:72-73).  The rebuild's policy: the TCP server already isolates
per-connection errors (serve/server.py); this watchdog covers the compute
side — if the engine stops producing frames (camera stall, wedged device
transport), it fires a callback (log, metric, or process restart) instead of
hanging silently.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable, Optional

log = logging.getLogger(__name__)


class Watchdog:
    """Fires ``on_stall`` if ``heartbeat()`` isn't called within ``timeout_s``."""

    def __init__(
        self,
        timeout_s: float = 5.0,
        on_stall: Optional[Callable[[float], None]] = None,
        check_interval_s: float = 0.5,
    ):
        self.timeout_s = timeout_s
        self.on_stall = on_stall or (
            lambda age: log.error("watchdog: no frame for %.1fs", age)
        )
        self.check_interval_s = check_interval_s
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._fired = False
        self._thread: Optional[threading.Thread] = None
        self.stall_count = 0

    def heartbeat(self) -> None:
        self._last = time.monotonic()
        self._fired = False

    def start(self) -> "Watchdog":
        self._thread = threading.Thread(target=self._loop, daemon=True, name="tod-watchdog")
        self._thread.start()
        return self

    def _loop(self) -> None:
        while not self._stop.wait(self.check_interval_s):
            age = time.monotonic() - self._last
            if age > self.timeout_s and not self._fired:
                self._fired = True
                self.stall_count += 1
                self.on_stall(age)

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
