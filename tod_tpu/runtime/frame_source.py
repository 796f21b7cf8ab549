"""Frame sources: the host-side camera abstraction.

Replaces the OpenNI2 sensor stack (src/scene.rs:37-120): no physical camera
exists in the TPU environment (SURVEY.md §2.2 item 3), so sources are:

- ``SyntheticSource``  deterministic moving-scene generator (C++ native when
                       built, NumPy fallback)
- ``PNGSource``        a golden image + synthetic depth, repeated (the
                       reference's debugging substitute input,
                       src/yolact.rs:203-204, data/frc_balls.png)
- ``TraceSource``      recorded RGB-D trace replay from a TODTRACE file
- ``RingSource``       the native producer-thread ring buffer pushing frames at
                       camera FPS (the tokio producer-task analog) — real
                       streaming semantics including frame drops
- ``PacedSource``      wraps any source to emit at a fixed FPS (a real
                       camera's rate limit) — multi-stream benchmarking needs
                       this so N unpaced generators don't saturate the host
                       core producing frames the drop-old policy discards
"""

from __future__ import annotations

import pathlib
import struct
from typing import Iterator, Optional, Protocol

import numpy as np

from tod_tpu.core.config import CameraConfig
from tod_tpu.core.types import Frame


class FrameSource(Protocol):
    def frames(self) -> Iterator[Frame]: ...
    def close(self) -> None: ...


def synth_frame_numpy(seed: int, t: int, h: int, w: int) -> Frame:
    """NumPy port of the native synthetic scene (framesource.cpp
    synth_frame_impl) — kept byte-identical so traces and tests can mix
    backends."""
    rgb = np.zeros((h, w, 3), np.uint8)
    depth = np.zeros((h, w), np.uint16)
    ramp = np.arange(h)
    d = (3800 - (3000 * ramp) // max(h - 1, 1)).astype(np.uint16)
    g = (60 + (80 * ramp) // max(h - 1, 1)).astype(np.uint8)
    depth[:] = d[:, None]
    rgb[..., 0] = (g // 2)[:, None]
    rgb[..., 1] = g[:, None]
    rgb[..., 2] = (g // 3)[:, None]

    yy, xx = np.mgrid[0:h, 0:w]

    def disc(cy, cx, r, color, dmm):
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        rgb[m] = color
        depth[m] = dmm

    def box(cy, cx, hh, hw2, color, dmm):
        m = (np.abs(yy - cy) <= hh) & (np.abs(xx - cx) <= hw2)
        rgb[m] = color
        depth[m] = dmm

    ph = (seed % 997) * 0.37
    a = 0.035 * t + ph
    disc(
        int(h * 0.62 + 0.12 * h * np.sin(a)),
        int(w * 0.40 + 0.25 * w * np.cos(a * 0.7)),
        h // 16, (240, 220, 40), 1400,
    )
    disc(
        int(h * 0.70 + 0.10 * h * np.cos(a * 1.3)),
        int(w * 0.65 + 0.20 * w * np.sin(a)),
        h // 18, (240, 220, 40), 1900,
    )
    box(
        int(h * 0.45), int(w * 0.20 + 0.10 * w * np.sin(a * 0.5)),
        h // 10, w // 12, (220, 40, 40), 2600,
    )
    box(
        int(h * 0.40), int(w * 0.80 + 0.08 * w * np.cos(a * 0.4)),
        h // 10, w // 12, (40, 60, 220), 3100,
    )
    return Frame(rgb=rgb, depth=depth)


class SyntheticSource:
    """Deterministic synthetic camera (C++ generator when available)."""

    def __init__(self, cam: CameraConfig | None = None, seed: int = 0, n_frames: Optional[int] = None):
        self.cam = cam or CameraConfig()
        self.seed = seed
        self.n_frames = n_frames
        try:
            from tod_tpu.native import loader

            self._lib = loader.get() if loader.available() else None
        except Exception:
            self._lib = None

    def _one(self, t: int) -> Frame:
        h, w = self.cam.height, self.cam.width
        if self._lib is not None:
            rgb = np.empty((h, w, 3), np.uint8)
            depth = np.empty((h, w), np.uint16)
            self._lib.tod_synth_frame(self.seed, t, h, w, rgb.reshape(-1), depth.reshape(-1))
            return Frame(rgb=rgb, depth=depth)
        return synth_frame_numpy(self.seed, t, h, w)

    def frames(self) -> Iterator[Frame]:
        t = 0
        while self.n_frames is None or t < self.n_frames:
            yield self._one(t)
            t += 1

    def close(self) -> None:
        pass


class PNGSource:
    """A fixed image (e.g. the reference fixture data/frc_balls.png) resized to
    camera resolution, paired with a synthetic depth ramp."""

    def __init__(self, path: str | pathlib.Path, cam: CameraConfig | None = None, n_frames: Optional[int] = None):
        from PIL import Image

        self.cam = cam or CameraConfig()
        self.n_frames = n_frames
        img = Image.open(path).convert("RGB").resize((self.cam.width, self.cam.height))
        self.rgb = np.asarray(img, np.uint8)
        ramp = np.linspace(3500, 600, self.cam.height).astype(np.uint16)
        self.depth = np.broadcast_to(ramp[:, None], (self.cam.height, self.cam.width)).copy()

    def frames(self) -> Iterator[Frame]:
        t = 0
        while self.n_frames is None or t < self.n_frames:
            yield Frame(rgb=self.rgb, depth=self.depth)
            t += 1

    def close(self) -> None:
        pass


class PacedSource:
    """Rate-limit any source to ``fps`` (a real camera's frame clock).

    Sleeps the PRODUCER to the camera period, never skipping frames — the
    drop-old consumers downstream decide what to discard.  Used by the
    multi-stream bench so N synthetic generators model N 30 FPS cameras
    instead of N busy loops fighting the (1-core) serving host."""

    def __init__(self, source, fps: float = 30.0):
        if fps <= 0:
            raise ValueError(f"fps must be positive, got {fps}")
        self._source = source
        self._period = 1.0 / fps

    def frames(self) -> Iterator[Frame]:
        import time

        next_t = time.monotonic()
        for frame in self._source.frames():
            now = time.monotonic()
            if now < next_t:
                time.sleep(next_t - now)
                now = next_t
            # schedule the next tick from the LATER of (plan, now): a slow
            # consumer delays the clock instead of accumulating a backlog
            # of instantly-released frames afterwards
            next_t = max(next_t + self._period, now)
            yield frame

    def close(self) -> None:
        self._source.close()


_TRACE_MAGIC = b"TODTRACE"


def write_trace(path: str | pathlib.Path, frames: list[Frame]) -> None:
    """Record frames to the TODTRACE format (shared with framesource.cpp)."""
    h, w = frames[0].rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(_TRACE_MAGIC)
        f.write(struct.pack("<III", h, w, len(frames)))
        for fr in frames:
            f.write(np.ascontiguousarray(fr.rgb, np.uint8).tobytes())
            f.write(np.ascontiguousarray(fr.depth, np.uint16).tobytes())


class TraceSource:
    """Replay a TODTRACE recording (loops when ``loop=True``)."""

    def __init__(self, path: str | pathlib.Path, loop: bool = False, n_frames: Optional[int] = None):
        self.path = pathlib.Path(path)
        raw = self.path.read_bytes()
        if raw[:8] != _TRACE_MAGIC:
            raise ValueError(f"{path} is not a TODTRACE file")
        self.h, self.w, self.count = struct.unpack_from("<III", raw, 8)
        self._raw = raw
        self.loop = loop
        self.n_frames = n_frames

    def _frame(self, k: int) -> Frame:
        px = self.h * self.w
        off = 20 + k * px * 5
        rgb = np.frombuffer(self._raw, np.uint8, px * 3, off).reshape(self.h, self.w, 3)
        depth = np.frombuffer(self._raw, np.uint16, px, off + px * 3).reshape(self.h, self.w)
        return Frame(rgb=rgb, depth=depth)

    def frames(self) -> Iterator[Frame]:
        t = 0
        while True:
            if self.n_frames is not None and t >= self.n_frames:
                return
            if not self.loop and t >= self.count:
                return
            yield self._frame(t % self.count)
            t += 1

    def close(self) -> None:
        pass


class RingSource:
    """Native producer-thread ring: frames arrive at camera FPS on a background
    thread; stale frames are dropped (drop-oldest).  Mirrors the reference's
    producer/consumer queue semantics (src/main.rs:36-37, src/scene.rs:102-109)
    with the queue in C++."""

    def __init__(
        self,
        cam: CameraConfig | None = None,
        capacity: int = 4,
        fps: float | None = None,
        seed: int = 0,
        trace_path: str | None = None,
        n_frames: Optional[int] = None,
    ):
        from tod_tpu.native import loader

        self.cam = cam or CameraConfig()
        self._lib = loader.get()
        self._ring = self._lib.tod_ring_create(capacity, self.cam.height, self.cam.width)
        self.n_frames = n_frames
        rc = self._lib.tod_ring_start_producer(
            self._ring,
            float(fps if fps is not None else self.cam.fps),
            seed,
            trace_path.encode() if trace_path else None,
        )
        if rc != 0:
            raise RuntimeError("ring producer failed to start")
        import threading

        self._close_lock = threading.Lock()

    def frames(self) -> Iterator[Frame]:
        h, w = self.cam.height, self.cam.width
        t = 0
        while self.n_frames is None or t < self.n_frames:
            rgb = np.empty((h, w, 3), np.uint8)
            depth = np.empty((h, w), np.uint16)
            ok = self._lib.tod_ring_pop(self._ring, rgb.reshape(-1), depth.reshape(-1), 2000)
            if not ok:
                return
            yield Frame(rgb=rgb, depth=depth)
            t += 1

    @property
    def stats(self) -> dict:
        return {
            "pushed": int(self._lib.tod_ring_stat_pushed(self._ring)),
            "dropped": int(self._lib.tod_ring_stat_dropped(self._ring)),
        }

    def close(self) -> None:
        # thread-safe + idempotent: the supervised runtime closes a wedged
        # source on a daemon thread while app-level cleanup may close it
        # again from the main thread — the handle must be claimed atomically
        # or both threads call tod_ring_destroy on the same pointer
        with self._close_lock:
            ring, self._ring = self._ring, None
        if ring:
            self._lib.tod_ring_destroy(ring)
