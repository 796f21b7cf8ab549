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


@functools.partial(
    jax.jit,
    static_argnames=("start_yx", "max_seeds", "min_pixels", "max_steps", "max_iters", "signed"),
)
def plan_on_device(
    height,
    balls,
    start_yx: tuple[int, int],
    max_seeds: int = 3,
    min_pixels: float = 3.0,
    max_steps: int = 1024,
    max_iters: int = 2048,
    signed: bool = False,
):
    """The WHOLE planning stage as one device graph: ball slots → seeds →
    Bellman-Ford relaxation → next-hop path walk → (magnitude, rotation) list.

    Serving rationale: the streaming host has one core; the ~20 ms host
    Dijkstra plus a 150 KB height readback per plan fights the dispatch loop
    for it (measured plan p50 70-80 ms in-loop).  Planning on the device
    costs ~7-9 ms of chip time that interleaves with frame steps, and the
    readback shrinks to the (max_steps, 2) f32 direction list (8 KB).

    → one (max_steps + 1, 2) f32 buffer: row 0 = (n_valid, 0); row 1+i is
    the i-th (magnitude, rotation) matching dijkstra.extract_directions
    semantics (src/path.rs:93-111 intent, ground-plane angles); rows past
    n_valid are 0.  Single-buffer so ONE readback materializes the plan.
    """
    h, w = height.shape
    height = height.astype(jnp.float32)

    # --- seeds from ball slots (dijkstra.seeds_from_balls semantics) -------
    cnt = balls[:, 2]
    topv, topi = jax.lax.top_k(cnt, max_seeds)
    ys = jnp.round(balls[topi, 1]).astype(jnp.int32)
    xs = jnp.round(balls[topi, 0]).astype(jnp.int32)
    ok = (topv > jnp.maximum(min_pixels, 0.0)) & (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    seed_mask = (
        jnp.zeros((h, w), jnp.int32)
        .at[jnp.where(ok, ys, 0), jnp.where(ok, xs, 0)]
        .max(ok.astype(jnp.int32))
        .astype(bool)
    )

    # --- edge weights from height (pt_cloud_weights.comp inline) -----------
    from tod_tpu.geometry.fusion import connection_weights

    _, conns = connection_weights(height)
    dist, next_dir = bellman_ford_grid.__wrapped__(height, conns, seed_mask, max_iters)

    # --- path walk (extract_directions semantics, on device) ---------------
    offs = jnp.asarray(NEIGHBOR_OFFSETS, jnp.int32)  # (8, 2)
    sy, sx = start_yx
    start_lin = jnp.int32(sy * w + sx)
    nd_flat = next_dir.reshape(-1)
    dist_flat = dist.reshape(-1)

    def hop(lin):
        """next node following next_dir (lin unchanged at terminals)."""
        d = nd_flat[lin]
        y, x = lin // w, lin % w
        step = offs[jnp.clip(d, 0, 7)]
        return jnp.where(d >= 0, (y + step[0]) * w + (x + step[1]), lin)

    def body(i, carry):
        cur, rotation, hx, hz, out, n = carry
        d = nd_flat[cur]
        alive = d >= 0
        nxt = hop(cur)
        mag = dist_flat[cur] - dist_flat[nxt]
        if signed:
            # drivable turn-chain semantics (PlannerConfig.signed_turns):
            # signed atan2 turn from the carried heading to THIS hop's
            # segment, heading follows the hop — matches
            # dijkstra.extract_directions(signed=True)
            sx = (nxt % w - cur % w).astype(jnp.float32)
            sz = (nxt // w - cur // w).astype(jnp.float32)
            moved = (sx != 0.0) | (sz != 0.0)
            turn = jnp.where(
                moved, jnp.arctan2(hx * sz - hz * sx, hx * sx + hz * sz), 0.0
            )
            out = out.at[i].set(
                jnp.where(alive, jnp.stack([mag, turn]), jnp.zeros(2))
            )
            hx = jnp.where(alive & moved, sx, hx)
            hz = jnp.where(alive & moved, sz, hz)
        else:
            out = out.at[i].set(
                jnp.where(alive, jnp.stack([mag, rotation]), jnp.zeros(2))
            )
            # turning angle for the NEXT hop: segments (cur←nxt) and (nn←nxt)
            # in the ground plane (grid x, grid y)
            nn = hop(nxt)
            ax = (cur % w - nxt % w).astype(jnp.float32)
            ay = (cur // w - nxt // w).astype(jnp.float32)
            bx = (nn % w - nxt % w).astype(jnp.float32)
            by = (nn // w - nxt // w).astype(jnp.float32)
            na = jnp.sqrt(ax * ax + ay * ay)
            nb = jnp.sqrt(bx * bx + by * by)
            cosang = jnp.clip((ax * bx + ay * by) / jnp.maximum(na * nb, 1e-12), -1.0, 1.0)
            rotation = jnp.where((na > 0) & (nb > 0), jnp.arccos(cosang), 0.0)
        return (
            jnp.where(alive, nxt, cur),
            rotation,
            hx,
            hz,
            out,
            n + alive.astype(jnp.int32),
        )

    reached = jnp.isfinite(jnp.where(dist_flat[start_lin] >= _INF, jnp.inf, dist_flat[start_lin]))
    init = (
        start_lin,
        jnp.float32(0.0),
        jnp.float32(0.0),   # heading x: initial facing (0, -1), up the map
        jnp.float32(-1.0),  # heading z
        jnp.zeros((max_steps, 2), jnp.float32),
        jnp.int32(0),
    )
    cur, _, _, _, out, n = jax.lax.fori_loop(0, max_steps, body, init)
    n = jnp.where(reached, n, 0)
    out = jnp.where(reached, out, jnp.zeros_like(out))
    # Truncation flag: the walk ran out of steps while still mid-path (the
    # final node has a next hop).  The host walk is uncapped, so without this
    # a too-long path would silently diverge between backends (ADVICE r2).
    truncated = reached & (nd_flat[cur] >= 0)
    # Single-buffer result: row 0 carries (n_valid, truncated), rows 1.. the
    # directions — ONE device→host readback materializes the whole plan
    # (each round trip on a remote transport costs tens of ms regardless of
    # size; a separate scalar read for n doubled the plan latency).
    header = jnp.stack([n.astype(jnp.float32), truncated.astype(jnp.float32)])[None, :]
    return jnp.concatenate([header, out], axis=0)


def extract_directions_from_next(
    dist, next_dir, pos, start_yx, max_steps=None, signed=False
):
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
    return extract_directions(
        dist, parent, np.asarray(pos), start_yx, max_steps, signed=signed
    )
