"""Closed-loop simulation (tod_tpu/sim): the drive-to-ball property.

The reference's product is steering directions for a robot
(src/path.rs:93-119, served to the RoboRIO over TCP), but its repo contains
no consumer and its loop panics after one frame (src/main.rs:92) — "the
robot reaches the ball" was never a testable property.  Here it is: a
metric world + a fusion-consistent renderer + a follower executing served
signed-turn Paths, gated end to end (including through the full YOLACT
perception graph with the pinned checkpoint).
"""

import math
import pathlib

import numpy as np
import pytest

from tod_tpu.core.config import CameraConfig, GeometryConfig, PlannerConfig
from tod_tpu.geometry.fusion import fuse_scene
from tod_tpu.planner.api import plan_from_height
from tod_tpu.sim import Ball, DirectionFollower, Obstacle, SimWorld, render
from tod_tpu.sim.loop import run_closed_loop

CAM = CameraConfig(width=320, height=240)
PCFG = PlannerConfig(signed_turns=True, start_offset=CAM.width // 2, backend="numpy")
GEOM = GeometryConfig()


def _oracle_scene(world):
    frame, cls, ids = render(world, CAM, annotate=True)
    scene = fuse_scene(frame.depth, cls, ids, CAM, GEOM)
    return np.asarray(scene.height, np.float32), np.asarray(scene.balls, np.float32)


class TestRendererFusionConsistency:
    def test_ball_lands_at_predicted_birdseye_cell(self):
        """The renderer is the exact inverse of birdseye_project: a ball at
        planar distance Z straight ahead must fuse to the centroid slot at
        (col W/2, row H − H·Z/max_depth) — sim-world and planner-grid
        geometry agree by construction."""
        world = SimWorld(balls=[Ball(0.0, 2000.0)])
        _, balls = _oracle_scene(world)
        slot = balls[np.argmax(balls[:, 2])]  # most-populated centroid slot
        assert slot[2] > 10, f"ball not fused: {slot}"
        np.testing.assert_allclose(slot[0], CAM.width / 2, atol=2.0)  # col
        expected_row = CAM.height - math.floor(
            CAM.height * 2000.0 / CAM.max_depth_mm
        )
        np.testing.assert_allclose(slot[1], expected_row, atol=2.0)

    def test_offset_ball_projects_to_pinhole_column(self):
        """Lateral offset maps through the pinhole: u = W/2 + fx·X/Z."""
        world = SimWorld(balls=[Ball(-600.0, 2400.0)])
        _, balls = _oracle_scene(world)
        slot = balls[np.argmax(balls[:, 2])]
        fx = (CAM.width / 2) / math.tan(CAM.x_fov / 2)
        expected_col = CAM.width / 2 + fx * (-600.0 / 2400.0)
        np.testing.assert_allclose(slot[0], expected_col, atol=3.0)


class TestSteering:
    def test_turn_sign_matches_ball_side(self):
        """Signed turns actually encode left vs right (the unsigned acos of
        the reference, src/path.rs:105-110, cannot)."""
        for bx, sign in ((-700.0, -1.0), (700.0, 1.0)):
            world = SimWorld(balls=[Ball(bx, 2400.0)])
            height, balls = _oracle_scene(world)
            path = plan_from_height(height, balls, PCFG)
            assert path.directions, f"no path for ball at x={bx}"
            follower = DirectionFollower(CAM, PCFG)
            turn, advance = follower.command(path)
            assert math.copysign(1.0, turn) == sign, (bx, turn)
            assert advance > 0

    def test_follower_rejects_unsigned_config(self):
        with pytest.raises(ValueError, match="signed_turns"):
            DirectionFollower(CAM, PlannerConfig(signed_turns=False))

    def test_search_and_blind_fallbacks(self):
        from tod_tpu.core.types import Path

        f = DirectionFollower(CAM, PCFG, blind_ticks=2)
        # no path ever seen → rotate-in-place search, no advance
        turn, adv = f.command(Path(created=0.0, directions=[]))
        assert adv == 0.0 and turn != 0.0
        # after a real command, an empty path first coasts straight
        # (blind finish), then falls back to searching
        f.command(Path(created=0.0, directions=[(5.0, 0.1), (5.0, 0.0)]))
        t1, a1 = f.command(Path(created=0.0, directions=[]))
        assert t1 == 0.0 and a1 > 0.0
        f.command(Path(created=0.0, directions=[]))
        t3, a3 = f.command(Path(created=0.0, directions=[]))
        assert a3 == 0.0 and t3 != 0.0


class TestClosedLoop:
    def test_reaches_offset_ball_oracle_perception(self):
        world = SimWorld(balls=[Ball(-700.0, 2400.0)])
        m = run_closed_loop(world, CAM, pcfg=PCFG, ticks=20)
        assert m["reached"], m
        assert m["ticks_used"] <= 15, m
        assert m["final_ball_mm"] <= 300.0

    def test_avoids_obstacle_and_reaches(self):
        """A robot box near the straight line: the planner's bump costs push
        the path around it, and the agent physically clears the footprint."""
        world = SimWorld(
            balls=[Ball(0.0, 3000.0)],
            obstacles=[Obstacle(-500.0, 1600.0)],
        )
        m = run_closed_loop(world, CAM, pcfg=PCFG, ticks=50)
        assert m["reached"], m
        assert m["min_obstacle_clearance_mm"] > 0.0, m

    def test_intercepts_rolling_ball(self):
        """A MOVING target: the ball rolls across the field while the agent
        chases.  Every tick of path staleness displaces the goal, so this is
        the scenario that makes replan freshness (drop-old planning, the
        latency-bounded serving rationale) a product property — and the
        search fallback proves out when the rolling ball exits the FOV."""
        world = SimWorld(balls=[Ball(900.0, 2600.0, vx=-120.0)])
        m = run_closed_loop(world, CAM, pcfg=PCFG, ticks=35)
        assert m["reached"], m
        assert m["final_ball_mm"] <= 300.0

    def test_multi_ball_reaches_a_ball(self):
        """With several balls, multi-source seeding grows the search tree
        from ALL of them (src/path.rs:37-49) and the agent reaches whichever
        the planner resolves as cheapest.  NOTE the cost field is NOT metric
        distance: terrain cells bump their own image row as "height"
        (pt_cloud.comp parity, geometry/fusion.occupancy_map), so the floor
        itself carries a cost gradient and the selected ball can be the
        metrically farther one — the gated property is that the closed loop
        converges on a planner-selected ball, not on Euclidean nearest."""
        balls = [Ball(500.0, 2000.0), Ball(-900.0, 3600.0)]
        world = SimWorld(balls=balls)
        m = run_closed_loop(world, CAM, pcfg=PCFG, ticks=20)
        assert m["reached"], m
        assert m["final_ball_mm"] <= 300.0

    def test_trail_dump_artifact(self, tmp_path):
        """dump_run writes the top-down trail plot (the reference's
        artifact-dump debugging story, SURVEY.md §4, applied to the sim)."""
        from tod_tpu.sim.loop import dump_run

        world = SimWorld(
            balls=[Ball(-700.0, 2400.0)], obstacles=[Obstacle(500.0, 1200.0)]
        )
        run_closed_loop(world, CAM, pcfg=PCFG, ticks=4)
        out = dump_run(world, str(tmp_path))
        from tod_tpu.utils.image_io import load_image

        img = load_image(out)
        assert img.ndim == 3 and img.shape[0] > 32 and img.shape[1] > 32
        # the plot actually contains the ball, obstacle, and trail colors
        for color in ((230, 200, 30), (220, 60, 60), (40, 150, 60)):
            assert (img == np.array(color, np.uint8)).all(-1).any(), color

    def test_tracker_coasts_through_detector_blackout(self):
        """Temporal tracking vs raw per-tick seeding under a mid-drive
        detector outage (tod_tpu/track; the sim analog of --track serving).

        A laterally rolling ball and a 6-tick measurement blackout starting
        at tick 2.  Raw seeding loses the plan immediately (the reference's
        per-frame Scene.balls seeding, src/path.rs:37-49) and falls back on
        the follower's blind/search heuristics; the tracked run keeps
        planning through the first coasting ticks (velocity-extrapolated
        seed, ego-motion compensated from the commanded maneuver) and
        reaches the ball measurably sooner.  Deterministic: seeded world,
        seeded renderer."""
        from tod_tpu.core.config import CameraConfig, TrackerConfig

        cam = CameraConfig(width=160, height=120)
        pcfg = PlannerConfig(
            signed_turns=True, start_offset=cam.width // 2, backend="numpy"
        )
        blackout = (2, 8)

        def run(tk):
            return run_closed_loop(
                SimWorld(balls=[Ball(-900.0, 3000.0, vx=130.0)]),
                cam, pcfg=pcfg, ticks=40, tracker=tk,
                measurement_blackout=blackout,
            )

        untracked = run(None)
        tracked = run(TrackerConfig(enabled=True, max_misses=12))
        assert tracked["reached"], tracked
        assert untracked["reached"]  # the fallbacks do recover, eventually
        # the tracked run reaches the ball sooner
        assert tracked["ticks_used"] < untracked["ticks_used"], (
            tracked["ticks_used"], untracked["ticks_used"],
        )
        # and it is still PLANNING in the first coasting ticks of the
        # blackout, where raw seeding has already gone blind
        t_dirs = [r.n_dirs for r in tracked["log"]]
        u_dirs = [r.n_dirs for r in untracked["log"]]
        assert t_dirs[2] > 0 and t_dirs[3] > 0, t_dirs
        assert u_dirs[2] == 0, u_dirs

    def test_occluded_ball_is_not_hallucinated(self):
        """A ball fully hidden behind a robot box yields no plan — the agent
        searches instead of driving into the obstacle."""
        world = SimWorld(
            balls=[Ball(0.0, 3000.0)],
            obstacles=[Obstacle(-50.0, 1500.0)],
        )
        m = run_closed_loop(world, CAM, pcfg=PCFG, ticks=12)
        assert not m["reached"]
        assert (world.x, world.z) == (0.0, 0.0)  # searched in place
        assert m["min_obstacle_clearance_mm"] > 1000.0

    @pytest.mark.slowgate
    def test_reaches_ball_through_full_model_perception(self):
        """The headline: rendered frames → YOLACT (pinned checkpoint) →
        detect → fusion → signed-turn plan → follower, closed loop, robot
        reaches the ball.  Every stage is the real serving path."""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_synth"
        if not ckpt.exists():
            pytest.skip("pinned checkpoint not present")
        from tod_tpu.core.config import ModelConfig, PipelineConfig
        from tod_tpu.runtime.engine import Engine
        from tod_tpu.train.checkpoint import load_checkpoint

        cfg = PipelineConfig(
            camera=CAM,
            model=ModelConfig(input_size=(240, 320)),
            planner=PCFG,
        )
        engine = Engine(cfg, params=load_checkpoint(str(ckpt)), mode="detect")
        world = SimWorld(balls=[Ball(-700.0, 2400.0)])
        m = run_closed_loop(
            world, CAM, pcfg=PCFG, engine=engine, perception="model", ticks=15
        )
        assert m["reached"], m
        assert m["final_ball_mm"] <= 300.0
