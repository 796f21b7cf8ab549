"""The closed loop: render → perceive → plan → steer → move, to the ball.

Two perception modes:

- ``perception="oracle"`` — the renderer's own class/id maps feed the fusion
  stage directly (no NN).  Fast; isolates the geometry+planner+controller
  chain for tests and many-tick runs.
- ``perception="model"`` — the full Engine graph (preprocess → YOLACT →
  detect → fusion) perceives the rendered frames, exactly the serving path.

Either way the plan is a real served Path (signed turns,
PlannerConfig.signed_turns) and motion is the DirectionFollower executing it
— so a passing run is evidence the ENTIRE product works: a simulated robot
using only this framework's outputs physically reaches the ball the camera
saw.  (The reference could never demonstrate this: its loop panics after one
frame, src/main.rs:92, and the consumer lived off-repo on the RoboRIO.)

CLI demo::

    python -m tod_tpu.sim --ball -700,2400 --obstacle 0,1500 --ticks 40
"""

from __future__ import annotations

import dataclasses
import math
import time

import numpy as np

from tod_tpu.core.config import CameraConfig, GeometryConfig, PlannerConfig
from tod_tpu.sim.camera import render
from tod_tpu.sim.controller import DirectionFollower
from tod_tpu.sim.world import Ball, Obstacle, SimWorld


@dataclasses.dataclass
class TickLog:
    tick: int
    x: float
    z: float
    heading: float
    ball_mm: float
    turn: float
    advance_mm: float
    n_dirs: int


def _shift_map(mem: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Integer-cell translate with zero fill: the (H, W) map counterpart of
    ``track.tracker.shift_tracks`` for ego-motion-compensating the obstacle
    memory.  Rounding to whole cells is fine — the memory decays within
    ~1/(1−decay) ticks, so sub-cell drift never accumulates."""
    h, w = mem.shape
    dyi, dxi = int(round(dy)), int(round(dx))
    if abs(dyi) >= h or abs(dxi) >= w:
        return np.zeros_like(mem)
    out = np.zeros_like(mem)
    out[
        max(dyi, 0) : h + min(dyi, 0), max(dxi, 0) : w + min(dxi, 0)
    ] = mem[max(-dyi, 0) : h + min(-dyi, 0), max(-dxi, 0) : w + min(-dxi, 0)]
    return out


def run_closed_loop(
    world: SimWorld,
    cam: CameraConfig,
    pcfg: PlannerConfig | None = None,
    geom: GeometryConfig | None = None,
    engine=None,
    perception: str = "oracle",
    ticks: int = 40,
    reach_mm: float = 300.0,
    follower: DirectionFollower | None = None,
    path_store=None,
    log_fn=None,
    tracker=None,
    measurement_blackout: tuple[int, int] | None = None,
    obstacle_blackout: tuple[int, int] | None = None,
    obstacle_memory: float = 0.0,
) -> dict:
    """Drive the agent until it reaches the nearest ball or ticks run out.

    Returns metrics: ``reached`` (bool), ``ticks_used``, ``final_ball_mm``,
    ``min_obstacle_clearance_mm``, and the per-tick ``log``.

    ``tracker`` (a ``TrackerConfig``) routes the planner seeds through the
    temporal Kalman track bank (tod_tpu/track) instead of the raw per-tick
    centroids — the sim analog of the Engine's ``--track`` serving mode.
    ``measurement_blackout=(t0, t1)`` zeroes the ball measurements for ticks
    t0 ≤ t < t1 (a detector dropout / full occlusion window), applied BEFORE
    the tracker so both seeding modes face the same outage.

    ``obstacle_blackout=(t0, t1)`` erases the ROBOT classes from the oracle
    annotation for those ticks (the detector missing the robot), and
    ``obstacle_memory=d > 0`` enables the sim analog of the Engine's
    ``--obstacle-memory`` mode: a decayed max of past robot bump layers
    (geometry.fusion.robot_occupancy), ego-motion-shifted by the commanded
    maneuver each tick (the map counterpart of ``shift_tracks``), max-fused
    into the planning height.  Oracle perception only (the model path's
    detections cannot be selectively erased host-side).
    """
    # sim default: planner start co-located with the camera center column
    # (the reference's fixed W−240 column is an artifact of its 640-wide
    # grid, src/path.rs:93 — config'd via PlannerConfig.start_offset)
    pcfg = pcfg or PlannerConfig(
        signed_turns=True, start_offset=cam.width // 2, backend="numpy"
    )
    geom = geom or GeometryConfig()
    follower = follower or DirectionFollower(cam, pcfg)

    if perception == "model":
        if engine is None:
            raise ValueError("perception='model' needs an Engine")
        if obstacle_blackout is not None or obstacle_memory > 0.0:
            raise ValueError(
                "obstacle_blackout/obstacle_memory are oracle-perception sim "
                "controls (the Engine has its own --obstacle-memory mode)"
            )
    elif perception != "oracle":
        raise ValueError(f"unknown perception {perception!r}")
    if not (0.0 <= obstacle_memory < 1.0):
        raise ValueError("obstacle_memory must be in [0, 1)")

    tracks = None
    if tracker is not None:
        from tod_tpu.track import init_tracks

        tracks = init_tracks(tracker)
    obstacle_mem = None  # (H, W) f32 decayed robot-bump memory

    log: list[TickLog] = []
    min_clear = world.obstacle_clearance()
    reached = False
    for t in range(ticks):
        if perception == "model":
            frame = render(world, cam, seed=t)
            scene, _dets = engine.process(frame)
            height = np.asarray(scene.height, np.float32)
            balls = np.asarray(scene.balls, np.float32)
        else:
            frame, cls, ids = render(world, cam, seed=t, annotate=True)
            if obstacle_blackout is not None and (
                obstacle_blackout[0] <= t < obstacle_blackout[1]
            ):
                # the detector misses the robot: erase robot classes to the
                # no-bump ball class (ids stay −1 there, so ball centroids
                # are untouched — gated exact in test_obstacle_memory.py)
                cls = np.where((cls == 1) | (cls == 2), 3, cls).astype(np.uint8)
            from tod_tpu.geometry.fusion import fuse_scene

            scene = fuse_scene(frame.depth, cls, ids, cam, geom)
            height = np.asarray(scene.height, np.float32)
            balls = np.asarray(scene.balls, np.float32)

        # ego-motion of the camera-relative birdseye frame from the PREVIOUS
        # commanded maneuver (the sim's odometry) — shared by the track bank
        # and the obstacle memory
        d_col = d_row = 0.0
        if log:
            prev = log[-1]
            d_col = -prev.turn * cam.width / (2.0 * math.tan(cam.x_fov / 2.0))
            d_row = prev.advance_mm * cam.height / cam.max_depth_mm

        if obstacle_memory > 0.0:
            from tod_tpu.geometry.fusion import robot_occupancy

            fresh = np.asarray(
                robot_occupancy(frame.depth, cls, cam, geom), np.float32
            )
            if obstacle_mem is None:
                obstacle_mem = fresh
            else:
                if log:  # the map counterpart of shift_tracks
                    obstacle_mem = _shift_map(obstacle_mem, d_col, d_row)
                obstacle_mem = np.maximum(fresh, obstacle_mem * obstacle_memory)
            height = np.maximum(height, obstacle_mem)

        if measurement_blackout is not None and (
            measurement_blackout[0] <= t < measurement_blackout[1]
        ):
            balls = np.zeros_like(balls)  # detector outage / full occlusion
        if tracker is not None:
            from tod_tpu.track import shift_tracks, track_update, tracks_to_balls

            if log:  # ego-motion compensation from the previous command
                # (one tick = a whole commanded maneuver; shift math in
                # track.tracker.shift_tracks)
                tracks = shift_tracks(tracks, d_col, d_row)
            tracks = track_update(tracks, balls, tracker)
            balls = np.asarray(
                tracks_to_balls(tracks, tracker, balls.shape[0]), np.float32
            )

        from tod_tpu.planner.api import plan_from_height

        path = plan_from_height(height, balls, pcfg)
        if path_store is not None:
            path_store.set(path)
        turn, advance = follower.command(path)
        world.step(turn, advance)
        min_clear = min(min_clear, world.obstacle_clearance())
        d = world.ball_distance()
        row = TickLog(
            t, world.x, world.z, world.heading, d, turn, advance,
            len(path.directions),
        )
        log.append(row)
        if log_fn is not None:
            log_fn(
                f"tick {t:3d}: pos=({world.x:7.0f},{world.z:7.0f}) "
                f"head={math.degrees(world.heading):6.1f}° ball={d:6.0f}mm "
                f"turn={math.degrees(turn):6.1f}° adv={advance:5.0f}mm "
                f"dirs={len(path.directions)}"
            )
        if d <= reach_mm:
            reached = True
            break
    return {
        "reached": reached,
        "ticks_used": len(log),
        "final_ball_mm": world.ball_distance(),
        "min_obstacle_clearance_mm": min_clear,
        "log": log,
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="tod_tpu.sim", description="closed-loop drive-to-ball simulation"
    )
    p.add_argument("--ball", action="append", default=None,
                   help="x,z in mm (repeatable); default -700,2400")
    p.add_argument("--obstacle", action="append", default=None,
                   help="x,z in mm (repeatable)")
    p.add_argument("--ticks", type=int, default=40)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--perception", choices=("oracle", "model"), default="oracle")
    p.add_argument("--checkpoint", default=None,
                   help="with --perception model: orbax dir (default pinned)")
    p.add_argument("--dump-dir", default=None,
                   help="write a top-down trail.png of the run here")
    args = p.parse_args(argv)

    def _parse(items, default, flag):
        if not items:
            return default
        out = []
        for it in items:
            parts = it.split(",")
            try:
                if len(parts) != 2:
                    raise ValueError
                out.append((float(parts[0]), float(parts[1])))
            except ValueError:
                p.error(f"{flag} expects 'x,z' in mm, got {it!r}")
        return out

    cam = CameraConfig(width=args.width, height=args.height)
    world = SimWorld(
        balls=[Ball(x, z) for x, z in _parse(args.ball, [(-700.0, 2400.0)], "--ball")],
        obstacles=[Obstacle(x, z) for x, z in _parse(args.obstacle, [], "--obstacle")],
    )
    engine = None
    if args.perception == "model":
        import pathlib

        from tod_tpu.core.config import ModelConfig, PipelineConfig
        from tod_tpu.runtime.engine import Engine

        ckpt = args.checkpoint
        if ckpt is None:
            from tod_tpu.train.checkpoint import pinned_checkpoint

            ckpt = pinned_checkpoint()
        params = None
        if ckpt:
            from tod_tpu.train.checkpoint import load_checkpoint

            params = load_checkpoint(ckpt)
        cfg = PipelineConfig(
            camera=cam,
            model=ModelConfig(
                input_size=(cam.height // 8 * 8, cam.width // 8 * 8)
            ),
            planner=PlannerConfig(
                signed_turns=True, start_offset=cam.width // 2, backend="numpy"
            ),
        )
        engine = Engine(cfg, params=params, mode="detect")
    t0 = time.perf_counter()
    m = run_closed_loop(
        world, cam, engine=engine, perception=args.perception,
        ticks=args.ticks, log_fn=print,
    )
    print(
        f"{'REACHED' if m['reached'] else 'not reached'} in {m['ticks_used']} ticks "
        f"({time.perf_counter() - t0:.1f}s); final ball distance "
        f"{m['final_ball_mm']:.0f} mm; min obstacle clearance "
        f"{m['min_obstacle_clearance_mm']:.0f} mm"
    )
    if args.dump_dir:
        print("trail plot:", dump_run(world, args.dump_dir))
    return 0 if m["reached"] else 1


def dump_run(world: SimWorld, out_dir: str, mm_per_px: float = 10.0) -> str:
    """Write a top-down metric plot of the run — trail, balls, obstacles —
    as ``trail.png`` in ``out_dir`` (the artifact-dump debugging story the
    reference used for its pipeline, SURVEY.md §4, applied to the sim)."""
    import pathlib

    from tod_tpu.utils.image_io import save_rgb

    xs = [p[0] for p in world.trail] + [b.x for b in world.balls] + [
        o.x for o in world.obstacles
    ]
    zs = [p[1] for p in world.trail] + [b.z for b in world.balls] + [
        o.z for o in world.obstacles
    ]
    margin = 500.0
    x0, x1 = min(xs) - margin, max(xs) + margin
    z0, z1 = min(zs) - margin, max(zs) + margin
    w = max(int((x1 - x0) / mm_per_px), 32)
    h = max(int((z1 - z0) / mm_per_px), 32)
    img = np.full((h, w, 3), 235, np.uint8)

    def px(x, z):
        # world +z up the image
        return (
            min(max(int((z1 - z) / mm_per_px), 0), h - 1),
            min(max(int((x - x0) / mm_per_px), 0), w - 1),
        )

    def blot(r, c, rad, color):
        rr, cc = np.mgrid[max(r - rad, 0):min(r + rad + 1, h),
                          max(c - rad, 0):min(c + rad + 1, w)]
        m = (rr - r) ** 2 + (cc - c) ** 2 <= rad * rad
        img[rr[m], cc[m]] = color

    for o in world.obstacles:
        r0, c0 = px(o.x - o.half_w, o.z + o.half_w)
        r1, c1 = px(o.x + o.half_w, o.z - o.half_w)
        img[min(r0, r1):max(r0, r1) + 1, min(c0, c1):max(c0, c1) + 1] = (
            (220, 60, 60) if o.team == "red" else (60, 80, 220)
        )
    for b in world.balls:
        blot(*px(b.x, b.z), max(int(b.radius / mm_per_px), 2), (230, 200, 30))
    for x, z in world.trail:
        blot(*px(x, z), 2, (40, 150, 60))
    blot(*px(*world.trail[0]), 4, (0, 0, 0))          # start
    blot(*px(world.x, world.z), 4, (200, 40, 160))    # end

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / "trail.png"
    save_rgb(path, img)
    return str(path)


if __name__ == "__main__":
    raise SystemExit(main())
