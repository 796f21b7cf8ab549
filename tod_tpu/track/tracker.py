"""Temporal ball tracking: constant-velocity Kalman filters over fusion
centroids, fused into the serving graph.

The reference plans from *per-frame* ball detections (src/path.rs:37-49 seeds
directly from ``Scene.balls``, which `pt_cloud.comp:78-82` rebuilds from
scratch every frame) — one missed detection and the target vanishes; one
spurious blob and the robot retargets.  Its author never reached the
continuous loop where that matters (the scene pass panics after one frame,
src/main.rs:92).  This module is the temporal layer that intended product
needs: measurements (ball centroid slots from ``geometry.fusion``) feed a
bank of constant-velocity Kalman filters with gated greedy association,
birth/confirmation/coast/death lifecycle, and the *tracks* — not the raw
detections — seed the planner.

TPU-native shape: the whole tracker is a pure fixed-shape jnp function over a
single ``(max_tracks, 10)`` f32 state array, so it fuses into the existing
frame+plan serving graph (``Engine._serve_step_plan``) and the state lives in
HBM between frames — zero extra host round trips, zero dynamic shapes.  The
filter bank is tiny (K≤8 tracks × M≤8 measurements), so its cost is noise
next to the model forward; the value is behavioral:

- **coasting**: an occluded ball keeps its track for ``max_misses`` updates,
  position extrapolated by the velocity estimate — the robot keeps driving
  toward where the ball is *going*, instead of aborting the plan;
- **confirmation**: a track must be measured ``min_hits`` times before it
  seeds the planner — single-frame false positives never steer the robot;
- **smoothing**: the planner target is the filtered position, not the raw
  per-frame centroid jitter.

State-row layout (f32): [x, y, vx, vy, p_pos, p_pv, p_vel, hits, misses,
active].  The position covariance is isotropic (one 2×2 symmetric P shared
by the x and y axes — exact, not an approximation, because both axes share
the same process/measurement noise and are always updated together), so a
full per-track Kalman costs 3 floats of covariance instead of 10.

Units: positions are birdseye grid cells (the ``Scene.balls`` coordinate
space); velocities are cells per *update* (dt ≡ 1 — the tracker steps once
per planning dispatch, so "velocity" is displacement per planning interval;
noise parameters are tuned in those units).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.core.config import TrackerConfig

_INF = jnp.float32(3.4e38)

# state-row field indices
X, Y, VX, VY, P_POS, P_PV, P_VEL, HITS, MISSES, ACTIVE = range(10)
STATE_WIDTH = 10

# pseudo-count base for confirmed tracks emitted in ball-slot format: must
# clear the planner's ``min_pixels`` seed gate (plan_on_device, default 3.0)
# regardless of hit count.
_SEED_COUNT_BASE = 100.0


def init_tracks(cfg: TrackerConfig):
    """All-inactive track bank: (max_tracks, 10) f32 zeros."""
    return jnp.zeros((cfg.max_tracks, STATE_WIDTH), jnp.float32)


def _predict(tracks, cfg: TrackerConfig):
    """CV predict step (dt = 1): x += v; P ← F P Fᵀ + Q."""
    q = cfg.accel_var
    x = tracks[:, X] + tracks[:, VX]
    y = tracks[:, Y] + tracks[:, VY]
    p_pos = tracks[:, P_POS] + 2.0 * tracks[:, P_PV] + tracks[:, P_VEL] + q * 0.25
    p_pv = tracks[:, P_PV] + tracks[:, P_VEL] + q * 0.5
    p_vel = tracks[:, P_VEL] + q
    out = tracks.at[:, X].set(x).at[:, Y].set(y)
    return out.at[:, P_POS].set(p_pos).at[:, P_PV].set(p_pv).at[:, P_VEL].set(p_vel)


def _associate(tracks, meas_xy, meas_valid, cfg: TrackerConfig):
    """Gated greedy global-nearest-neighbor assignment.

    → assign (max_tracks,) i32: measurement index per track, −1 = none.
    Greedy-by-global-minimum (the sequential auction over a K×M matrix)
    run as a fixed ``max_tracks``-step fori_loop — K and M are ≤8, so this
    is a handful of VPU ops, and unlike Hungarian it is jit-trivial.
    """
    k = tracks.shape[0]
    active = tracks[:, ACTIVE] > 0
    d2 = jnp.sum(
        (tracks[:, None, :2] - meas_xy[None, :, :]) ** 2, axis=-1
    )  # (K, M)  (state cols 0:2 are x, y)
    pair_ok = active[:, None] & meas_valid[None, :] & (d2 <= cfg.gate**2)
    cost0 = jnp.where(pair_ok, d2, _INF)

    def body(_, carry):
        cost, assign = carry
        flat = jnp.argmin(cost.reshape(-1))
        ti, mi = flat // cost.shape[1], flat % cost.shape[1]
        ok = cost.reshape(-1)[flat] < _INF
        assign = assign.at[ti].set(jnp.where(ok, mi.astype(jnp.int32), assign[ti]))
        # retire the chosen row and column
        row_mask = jnp.arange(cost.shape[0]) == ti
        col_mask = jnp.arange(cost.shape[1]) == mi
        kill = ok & (row_mask[:, None] | col_mask[None, :])
        return jnp.where(kill, _INF, cost), assign

    _, assign = jax.lax.fori_loop(
        0, k, body, (cost0, jnp.full((k,), -1, jnp.int32))
    )
    return assign


def track_update(tracks, balls, cfg: TrackerConfig):
    """One tracker step: predict → associate → Kalman update → lifecycle.

    tracks: (max_tracks, 10) f32 state bank (init_tracks)
    balls:  (max_balls, 4) f32 fusion centroid slots (x̄, ȳ, count, 0) —
            geometry.fusion.ball_centroids layout (pt_cloud.comp:16-20)
    → new (max_tracks, 10) f32 bank.  Pure jnp, fixed shapes, jit/fuse-safe.
    """
    tracks = _predict(tracks, cfg)
    meas_xy = balls[:, :2]
    meas_valid = balls[:, 2] > cfg.min_pixels
    assign = _associate(tracks, meas_xy, meas_valid, cfg)

    matched = assign >= 0
    safe = jnp.maximum(assign, 0)
    z = meas_xy[safe]  # (K, 2)
    # Kalman update (shared isotropic 2×2 P; H = [1 0]):
    s = tracks[:, P_POS] + cfg.meas_var
    k1 = tracks[:, P_POS] / s
    k2 = tracks[:, P_PV] / s
    rx = z[:, 0] - tracks[:, X]
    ry = z[:, 1] - tracks[:, Y]
    upd = (
        tracks.at[:, X].add(jnp.where(matched, k1 * rx, 0.0))
        .at[:, Y].add(jnp.where(matched, k1 * ry, 0.0))
        .at[:, VX].add(jnp.where(matched, k2 * rx, 0.0))
        .at[:, VY].add(jnp.where(matched, k2 * ry, 0.0))
    )
    p_pos = jnp.where(matched, (1.0 - k1) * tracks[:, P_POS], tracks[:, P_POS])
    p_pv = jnp.where(matched, (1.0 - k1) * tracks[:, P_PV], tracks[:, P_PV])
    p_vel = jnp.where(
        matched, tracks[:, P_VEL] - k2 * tracks[:, P_PV], tracks[:, P_VEL]
    )
    upd = upd.at[:, P_POS].set(p_pos).at[:, P_PV].set(p_pv).at[:, P_VEL].set(p_vel)

    # lifecycle: hits/misses/death
    active = upd[:, ACTIVE] > 0
    hits = jnp.where(matched, upd[:, HITS] + 1.0, upd[:, HITS])
    misses = jnp.where(matched, 0.0, jnp.where(active, upd[:, MISSES] + 1.0, 0.0))
    alive = active & (misses <= cfg.max_misses)
    upd = (
        upd.at[:, HITS].set(jnp.where(alive, hits, 0.0))
        .at[:, MISSES].set(jnp.where(alive, misses, 0.0))
        .at[:, ACTIVE].set(alive.astype(jnp.float32))
    )

    # births: unassigned valid measurements claim free slots, rank-matched
    # (i-th free slot takes the i-th unassigned measurement) — a one-hot
    # (K, M) match, no dynamic shapes.
    m = meas_xy.shape[0]
    meas_taken = (
        jnp.zeros((m,), jnp.int32).at[safe].max(matched.astype(jnp.int32)) > 0
    )
    meas_free = meas_valid & ~meas_taken
    slot_free = upd[:, ACTIVE] <= 0
    slot_rank = jnp.cumsum(slot_free.astype(jnp.int32)) - 1  # rank among free
    meas_rank = jnp.cumsum(meas_free.astype(jnp.int32)) - 1
    match = (
        slot_free[:, None]
        & meas_free[None, :]
        & (slot_rank[:, None] == meas_rank[None, :])
    )  # (K, M) at most one True per row/col
    birth = jnp.any(match, axis=1)
    bm = jnp.argmax(match, axis=1)
    bz = meas_xy[bm]
    newborn = jnp.stack(
        [
            bz[:, 0],
            bz[:, 1],
            jnp.zeros_like(bz[:, 0]),
            jnp.zeros_like(bz[:, 0]),
            jnp.full_like(bz[:, 0], cfg.meas_var),
            jnp.zeros_like(bz[:, 0]),
            jnp.full_like(bz[:, 0], cfg.vel0_var),
            jnp.ones_like(bz[:, 0]),
            jnp.zeros_like(bz[:, 0]),
            jnp.ones_like(bz[:, 0]),
        ],
        axis=-1,
    )
    return jnp.where(birth[:, None], newborn, upd)


def tracks_to_balls(tracks, cfg: TrackerConfig, max_balls: int):
    """Confirmed tracks in the planner's ball-slot format → (max_balls, 4).

    Slot i carries track i's filtered position with a pseudo-count of
    ``_SEED_COUNT_BASE + hits`` (always clears plan_on_device's min_pixels
    gate; higher-hit tracks win the top-k seed selection), 0 for
    unconfirmed/empty slots.  ``max_balls`` must be ≥ cfg.max_tracks.
    """
    confirmed = (tracks[:, ACTIVE] > 0) & (tracks[:, HITS] >= cfg.min_hits)
    cnt = jnp.where(confirmed, _SEED_COUNT_BASE + tracks[:, HITS], 0.0)
    slots = jnp.stack(
        [tracks[:, X], tracks[:, Y], cnt, jnp.zeros_like(cnt)], axis=-1
    )
    pad = max_balls - tracks.shape[0]
    if pad < 0:
        raise ValueError(
            f"max_balls ({max_balls}) < max_tracks ({tracks.shape[0]})"
        )
    return jnp.pad(slots, ((0, pad), (0, 0)))


def shift_tracks(tracks, dx, dy):
    """Ego-motion compensation: translate every track position by
    ``(dx, dy)`` grid cells (velocities/covariances unchanged).

    The track bank lives in the camera-relative birdseye frame, so the
    robot's own motion moves every track.  At serving rates (30 FPS) the
    per-frame ego-motion is a few cells and the association gate absorbs it;
    consumers with coarse update intervals and known odometry (the sim's
    control ticks command whole (turn, advance) maneuvers) apply the
    commanded motion here before ``track_update``.  Column shift for a yaw
    of θ is ≈ ``−θ · W / (2·tan(x_fov/2))`` (the birdseye x axis is pixel-
    projective, geometry/fusion.birdseye_project); row shift for an advance
    of ``a`` mm is ``+a · H / max_depth_mm`` (objects get closer → larger
    birdseye row).
    """
    return tracks.at[:, X].add(dx).at[:, Y].add(dy)


# --------------------------------------------------------------------------
# NumPy oracle (sequential, readable) — the test reference implementation.
# --------------------------------------------------------------------------


def track_update_oracle(tracks, balls, cfg: TrackerConfig):
    """Sequential NumPy mirror of track_update, for oracle tests."""
    t = np.array(tracks, np.float32)
    balls = np.asarray(balls, np.float32)
    q = cfg.accel_var
    # predict
    t[:, X] += t[:, VX]
    t[:, Y] += t[:, VY]
    p_pos = t[:, P_POS] + 2 * t[:, P_PV] + t[:, P_VEL] + q * 0.25
    p_pv = t[:, P_PV] + t[:, P_VEL] + q * 0.5
    t[:, P_VEL] += q
    t[:, P_POS], t[:, P_PV] = p_pos, p_pv
    # associate: greedy global min
    meas_valid = balls[:, 2] > cfg.min_pixels
    k, m = t.shape[0], balls.shape[0]
    d2 = ((t[:, None, [X, Y]] - balls[None, :, :2]) ** 2).sum(-1)
    cost = np.where(
        (t[:, ACTIVE] > 0)[:, None] & meas_valid[None, :] & (d2 <= cfg.gate**2),
        d2,
        np.inf,
    )
    assign = np.full(k, -1, np.int32)
    for _ in range(min(k, m)):
        if not np.isfinite(cost).any():
            break
        ti, mi = np.unravel_index(np.argmin(cost), cost.shape)
        assign[ti] = mi
        cost[ti, :] = np.inf
        cost[:, mi] = np.inf
    # update + lifecycle
    taken = set()
    for i in range(k):
        if assign[i] >= 0:
            taken.add(int(assign[i]))
            z = balls[assign[i], :2]
            s = t[i, P_POS] + cfg.meas_var
            k1, k2 = t[i, P_POS] / s, t[i, P_PV] / s
            r = z - t[i, [X, Y]]
            t[i, X] += k1 * r[0]
            t[i, Y] += k1 * r[1]
            t[i, VX] += k2 * r[0]
            t[i, VY] += k2 * r[1]
            p_old = t[i, P_PV]
            t[i, P_POS] *= 1 - k1
            t[i, P_PV] *= 1 - k1
            t[i, P_VEL] -= k2 * p_old
            t[i, HITS] += 1
            t[i, MISSES] = 0
        elif t[i, ACTIVE] > 0:
            t[i, MISSES] += 1
            if t[i, MISSES] > cfg.max_misses:
                t[i, HITS] = t[i, MISSES] = t[i, ACTIVE] = 0
    # births
    free_meas = [
        j for j in range(m) if meas_valid[j] and j not in taken
    ]
    free_slots = [i for i in range(k) if t[i, ACTIVE] <= 0]
    for i, j in zip(free_slots, free_meas):
        t[i] = [
            balls[j, 0], balls[j, 1], 0, 0,
            cfg.meas_var, 0, cfg.vel0_var, 1, 0, 1,
        ]
    return t
