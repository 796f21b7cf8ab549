"""On-TPU shortest-path relaxation (Bellman-Ford to fixpoint).

The idiomatic TPU form of the planner (SURVEY.md §7 "Hard parts": worklist
algorithms → iterated relaxation inside ``lax.while_loop``).  Each sweep updates

    dist[n] = min(dist[n], min_i dist[n + off_i] + connections[n][i] + |Δheight|)

over all 8 directions simultaneously — a vectorized min-plus stencil, converging
in O(path diameter) sweeps.  Produces the same distances as the host Dijkstra
(both are exact shortest paths; only the cost model differs — this one trades
heap pops for full-grid VPU sweeps, profitable when the scene already lives in
HBM and the result feeds back into on-device work).

The next-hop map is derived after convergence by re-evaluating the relaxation
and taking the argmin direction; the (short) path walk itself happens on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tod_tpu.core.types import NEIGHBOR_OFFSETS

_INF = jnp.float32(3.4e38)


def _shift(x, dy: int, dx: int, fill):
    """x shifted so out[p] = x[p + (dy, dx)], padded with ``fill``."""
    h, w = x.shape
    padded = jnp.pad(x, 1, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))


def _relax_candidates(dist, height, connections):
    """(8, H, W) candidate costs entering each node from each direction."""
    cands = []
    for i, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
        nd = _shift(dist, dy, dx, _INF)
        nh = _shift(height, dy, dx, jnp.float32(0))
        edge = connections[..., i]
        c = jnp.where(edge >= 0, nd + edge + jnp.abs(height - nh), _INF)
        cands.append(c)
    return jnp.stack(cands, axis=0)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def bellman_ford_grid(height, connections, seed_mask, max_iters: int = 2048):
    """height (H, W) f32, connections (H, W, 8) f32 (−1 = no edge),
    seed_mask (H, W) bool → (dist (H, W) f32, next_dir (H, W) i32).

    ``next_dir[p]`` is the NEIGHBOR_OFFSETS index of the next hop toward the
    nearest seed (−1 at seeds / unreached nodes).
    """
    height = height.astype(jnp.float32)
    connections = connections.astype(jnp.float32)
    dist0 = jnp.where(seed_mask, 0.0, _INF)

    def cond(state):
        dist, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        dist, _, it = state
        cands = _relax_candidates(dist, height, connections)
        new = jnp.minimum(dist, jnp.min(cands, axis=0))
        return new, jnp.any(new < dist), it + 1

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, jnp.array(True), jnp.array(0, jnp.int32))
    )
    cands = _relax_candidates(dist, height, connections)
    best = jnp.argmin(cands, axis=0).astype(jnp.int32)
    reached = jnp.isfinite(jnp.where(dist >= _INF, jnp.inf, dist))
    next_dir = jnp.where(seed_mask | ~reached, -1, best)
    return dist, next_dir


def extract_directions_from_next(dist, next_dir, pos, start_yx, max_steps=None):
    """Host-side path walk for the TPU backend (mirrors
    dijkstra.extract_directions but follows direction indices)."""
    import numpy as np

    from tod_tpu.planner.dijkstra import extract_directions

    dist = np.asarray(dist)
    next_dir = np.asarray(next_dir)
    h, w = dist.shape
    parent = np.full((h, w), -1, np.int64)
    ys, xs = np.nonzero(next_dir >= 0)
    for y, x in zip(ys, xs):
        dy, dx = NEIGHBOR_OFFSETS[next_dir[y, x]]
        parent[y, x] = (y + dy) * w + (x + dx)
    dist = np.where(dist >= 3.4e38, np.inf, dist)
    return extract_directions(dist, parent, np.asarray(pos), start_yx, max_steps)
