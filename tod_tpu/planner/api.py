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


def plan(scene: Scene, cfg: PlannerConfig | None = None) -> Path:
    """Compute driving directions from the fused scene (replaces
    src/path.rs:25-120's ``modify_path``)."""
    cfg = cfg or PlannerConfig()
    height = np.asarray(scene.height, np.float32)
    connections = np.asarray(scene.connections, np.float32)
    pos = np.asarray(scene.pos, np.float32)
    balls = np.asarray(scene.balls, np.float32)
    hw = height.shape
    seeds = seeds_from_balls(balls, cfg.max_seed_balls, hw)
    start = start_node_yx(hw)
    if not seeds:
        return Path(created=time.time(), directions=[])

    backend = cfg.backend
    if backend == "auto":
        from tod_tpu.native import loader

        backend = "native" if loader.available() else "numpy"

    if backend == "native":
        from tod_tpu.planner.native import dijkstra_native

        dist, parent = dijkstra_native(height, connections, seeds)
        directions = extract_directions(dist, parent, pos, start)
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
        directions = extract_directions_from_next(dist, next_dir, pos, start)
    elif backend == "numpy":
        dist, parent = dijkstra_grid(height, connections, seeds)
        directions = extract_directions(dist, parent, pos, start)
    else:
        raise ValueError(f"unknown planner backend {backend!r}")

    return Path(created=time.time(), directions=directions)
