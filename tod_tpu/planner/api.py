"""Planner facade: Scene → Path, dispatching over backends.

Backends:
- ``numpy``  host Dijkstra with a real priority queue (planner/dijkstra.py)
- ``native`` C++ Dijkstra via ctypes (planner/native.py) — the hot host path,
  ~300k-node grids in a few ms
- ``tpu``    on-device Bellman-Ford relaxation (planner/tpu_relax.py)
- ``auto``   native if the extension is built, else numpy
"""

from __future__ import annotations

import time

import numpy as np

from tod_tpu.core.config import PlannerConfig
from tod_tpu.core.types import Path, Scene
from tod_tpu.planner.dijkstra import (
    dijkstra_grid,
    extract_directions,
    seeds_from_balls,
    start_node_yx,
)


def _connections_from_height(height: np.ndarray) -> np.ndarray:
    """Rebuild the (H, W, 8) edge weights from the height map on host (NumPy
    shifts) — identical to geometry.fusion.connection_weights."""
    from tod_tpu.core.types import NEIGHBOR_OFFSETS

    h, w = height.shape
    padded = np.pad(height.astype(np.float32), 1, constant_values=np.nan)
    conns = np.empty((h, w, 8), np.float32)
    for i, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
        nh = padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        d = np.sqrt(dx * dx + dy * dy + (height - nh) ** 2)
        conns[..., i] = np.where(np.isnan(nh), -1.0, d)
    return conns


def plan_from_height(
    height: np.ndarray, balls: np.ndarray, cfg: PlannerConfig | None = None
) -> Path:
    """Plan using only the height map + ball slots.

    The connection weights and world positions the full path uses are pure
    functions of the height map (pos = (x, h, y); edges = √(dx²+dy²+Δh²)), so
    the hot serving loop reads back ~12× less data per frame (height 300 KB vs
    the full 3.7 MB Scene at QVGA) and the native backend derives edges inline.
    """
    cfg = cfg or PlannerConfig()
    height = np.ascontiguousarray(height, np.float32)
    hw = height.shape
    seeds = seeds_from_balls(
        np.asarray(balls, np.float32), cfg.max_seed_balls, hw,
        min_pixels=cfg.min_ball_pixels,
    )
    if not seeds:
        return Path(created=time.time(), directions=[])
    start = start_node_yx(hw, offset=cfg.start_offset)

    backend = cfg.backend
    if backend not in ("auto", "native", "numpy", "tpu"):
        raise ValueError(f"unknown planner backend {backend!r}")
    if backend in ("auto", "native"):
        from tod_tpu.native import loader

        if loader.available():
            lib = loader.get()
            dist = np.empty(hw, np.float64)
            parent = np.empty(hw, np.int64)
            seed_arr = np.ascontiguousarray(np.array(seeds, np.int32))
            fn = (
                lib.tod_dijkstra_height_bidir
                if cfg.bidirectional
                else lib.tod_dijkstra_height
            )
            fn(
                height.reshape(-1), hw[0], hw[1], seed_arr.reshape(-1),
                len(seeds), start[0], start[1],
                dist.reshape(-1), parent.reshape(-1),
            )
            pos = _pos_from_height(height)
            return Path(
                created=time.time(),
                directions=extract_directions(
                    dist, parent, pos, start, signed=cfg.signed_turns
                ),
            )
        if backend == "native":
            raise RuntimeError("native planner backend requested but libtodtpu unavailable")
    if backend == "tpu":
        import jax.numpy as jnp

        from tod_tpu.planner.tpu_relax import (
            bellman_ford_grid,
            extract_directions_from_next,
        )

        conns = _connections_from_height(height)
        seed_mask = np.zeros(hw, bool)
        for y, x in seeds:
            seed_mask[y, x] = True
        dist, next_dir = bellman_ford_grid(
            jnp.asarray(height), jnp.asarray(conns), jnp.asarray(seed_mask),
            max_iters=cfg.tpu_max_iters,
        )
        pos = _pos_from_height(height)
        return Path(
            created=time.time(),
            directions=extract_directions_from_next(
                dist, next_dir, pos, start, signed=cfg.signed_turns
            ),
        )
    conns = _connections_from_height(height)
    dist, parent = dijkstra_grid(height, conns, seeds)
    pos = _pos_from_height(height)
    return Path(
        created=time.time(),
        directions=extract_directions(dist, parent, pos, start, signed=cfg.signed_turns),
    )


def dispatch_plan_device(
    height_dev, balls_dev, cfg: PlannerConfig | None = None,
    start_yx: tuple[int, int] | None = None,
):
    """Dispatch the device plan graph (async); → one (max_steps+1, 2) f32
    device buffer (row 0 = header with n_valid).  Call from the serving loop
    at a sync point so the plan runs while the dispatch queue is empty;
    materialize on a worker thread."""
    cfg = cfg or PlannerConfig()
    from tod_tpu.planner.tpu_relax import plan_on_device

    h, w = height_dev.shape
    start = start_yx or start_node_yx((h, w), offset=cfg.start_offset)
    return plan_on_device(
        height_dev, balls_dev, start,
        max_seeds=cfg.max_seed_balls,
        min_pixels=cfg.min_ball_pixels,
        max_steps=cfg.max_path_steps,
        max_iters=cfg.tpu_max_iters,
        signed=cfg.signed_turns,
    )


_warned_truncated = False


def materialize_path(plan_dev) -> Path:
    """Read back a dispatched device plan (ONE ~8 KB transfer) into a Path."""
    buf = np.asarray(plan_dev)
    n = int(buf[0, 0])
    truncated = bool(buf[0, 1] > 0)
    if truncated:
        # warn ONCE per process: a persistently-distant target would
        # otherwise emit this on every plan (~20+/s in the serving hot
        # path); Path.truncated carries the per-plan signal
        global _warned_truncated
        if not _warned_truncated:
            _warned_truncated = True
            import logging

            logging.getLogger(__name__).warning(
                "device plan truncated at %d steps (PlannerConfig.max_path_steps);"
                " further truncations reported via Path.truncated only", n
            )
    dirs = buf[1 : 1 + n]
    return Path(
        created=time.time(),
        directions=[(float(m), float(r)) for m, r in dirs],
        truncated=truncated,
    )


def plan_directions_device(
    height_dev, balls_dev, cfg: PlannerConfig | None = None,
    start_yx: tuple[int, int] | None = None,
) -> Path:
    """Device-resident planning: height/balls stay in HBM, the whole stage
    (seeds → Bellman-Ford → path walk) runs as one jit graph, and only the
    (max_steps+1, 2) f32 plan buffer is read back (~8 KB vs the 150 KB
    height map).  The serving-loop planner path when backend == "tpu"."""
    return materialize_path(dispatch_plan_device(height_dev, balls_dev, cfg, start_yx))


def _pos_from_height(height: np.ndarray) -> np.ndarray:
    h, w = height.shape
    pos = np.empty((h, w, 3), np.float32)
    pos[..., 0] = np.arange(w, dtype=np.float32)[None, :]
    pos[..., 1] = height
    pos[..., 2] = np.arange(h, dtype=np.float32)[:, None]
    return pos


def plan(scene: Scene, cfg: PlannerConfig | None = None) -> Path:
    """Compute driving directions from the fused scene (replaces
    src/path.rs:25-120's ``modify_path``)."""
    cfg = cfg or PlannerConfig()
    height = np.asarray(scene.height, np.float32)
    connections = np.asarray(scene.connections, np.float32)
    pos = np.asarray(scene.pos, np.float32)
    balls = np.asarray(scene.balls, np.float32)
    hw = height.shape
    seeds = seeds_from_balls(balls, cfg.max_seed_balls, hw, min_pixels=cfg.min_ball_pixels)
    start = start_node_yx(hw, offset=cfg.start_offset)
    if not seeds:
        return Path(created=time.time(), directions=[])

    backend = cfg.backend
    if backend == "auto":
        from tod_tpu.native import loader

        backend = "native" if loader.available() else "numpy"

    if backend == "native":
        from tod_tpu.planner.native import dijkstra_native

        dist, parent = dijkstra_native(height, connections, seeds)
        directions = extract_directions(dist, parent, pos, start, signed=cfg.signed_turns)
    elif backend == "tpu":
        import jax.numpy as jnp

        from tod_tpu.planner.tpu_relax import (
            bellman_ford_grid,
            extract_directions_from_next,
        )

        seed_mask = np.zeros(hw, bool)
        for y, x in seeds:
            seed_mask[y, x] = True
        dist, next_dir = bellman_ford_grid(
            jnp.asarray(height),
            jnp.asarray(connections),
            jnp.asarray(seed_mask),
            max_iters=cfg.tpu_max_iters,
        )
        directions = extract_directions_from_next(
            dist, next_dir, pos, start, signed=cfg.signed_turns
        )
    elif backend == "numpy":
        dist, parent = dijkstra_grid(height, connections, seeds)
        directions = extract_directions(dist, parent, pos, start, signed=cfg.signed_turns)
    else:
        raise ValueError(f"unknown planner backend {backend!r}")

    return Path(created=time.time(), directions=directions)
