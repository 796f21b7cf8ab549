"""Decaying obstacle memory (TrackerConfig.obstacle_memory): the robot-
obstacle counterpart of ball-track coasting.

The reference rebuilds the occupancy map from scratch every frame
(pt_cloud.comp:108-114) — one missed robot detection and the planner routes
straight through the robot.  The memory keeps an HBM-resident decayed max of
past robot bump layers (geometry.fusion.robot_occupancy) inside the tracked
serving graph, so the planning height is max(fresh occupancy, decay^k ·
remembered bumps).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import CameraConfig, GeometryConfig, TrackerConfig
from tod_tpu.geometry import occupancy_map, robot_occupancy

CAM = CameraConfig(width=40, height=32)
GEOM = GeometryConfig(terrain_norm_const=3, bot_norm_const=5)


@pytest.fixture(scope="module")
def scene_inputs():
    rng = np.random.default_rng(7)
    h, w = CAM.height, CAM.width
    depth = rng.integers(200, 3500, (h, w)).astype(np.uint16)
    cls = np.zeros((h, w), np.uint8)
    cls[5:9, 6:10] = 1  # red robot blob
    cls[20:24, 25:30] = 3  # ball blob
    cls[12:14, 30:33] = 2  # blue robot blob
    return depth, cls


class TestRobotLayer:
    def test_occupancy_is_max_of_terrain_and_robot_layers(self, scene_inputs):
        """Exactness: occupancy_map == max(terrain-only occupancy, robot
        layer).  Erasing robot pixels to the ball class (which writes no
        bump) leaves exactly the terrain component."""
        depth, cls = scene_inputs
        full = np.asarray(occupancy_map(depth, cls, CAM, GEOM))
        cls_no_robots = np.where((cls == 1) | (cls == 2), 3, cls).astype(np.uint8)
        terrain_only = np.asarray(occupancy_map(depth, cls_no_robots, CAM, GEOM))
        robots = np.asarray(robot_occupancy(depth, cls, CAM, GEOM))
        np.testing.assert_array_equal(full, np.maximum(terrain_only, robots))

    def test_robot_layer_nonzero_and_border_masked(self, scene_inputs):
        depth, cls = scene_inputs
        robots = np.asarray(robot_occupancy(depth, cls, CAM, GEOM))
        assert robots.max() > 0.0
        assert robots[0, :].max() == 0.0 and robots[-1, :].max() == 0.0
        assert robots[:, 0].max() == 0.0 and robots[:, -1].max() == 0.0

    def test_no_robots_means_zero_layer(self, scene_inputs):
        depth, cls = scene_inputs
        cls_no_robots = np.where((cls == 1) | (cls == 2), 3, cls).astype(np.uint8)
        robots = np.asarray(robot_occupancy(depth, cls_no_robots, CAM, GEOM))
        assert robots.max() == 0.0


class TestDecaySemantics:
    def test_memory_decays_geometrically_through_a_blackout(self, scene_inputs):
        """Robot present once, then gone for k dispatches: the memory is
        exactly decay^k times the fresh robot layer."""
        depth, cls = scene_inputs
        decay = 0.8
        robots = robot_occupancy(depth, cls, CAM, GEOM)
        absent = jnp.zeros_like(robots)
        mem = jnp.zeros_like(robots)
        mem = jnp.maximum(robots, mem * decay)  # detection frame
        np.testing.assert_allclose(np.asarray(mem), np.asarray(robots))
        for k in range(1, 4):  # blackout frames
            mem = jnp.maximum(absent, mem * decay)
            np.testing.assert_allclose(
                np.asarray(mem), decay**k * np.asarray(robots), rtol=1e-6
            )

    def test_fresh_detection_resets_the_decay(self, scene_inputs):
        depth, cls = scene_inputs
        decay = 0.8
        robots = robot_occupancy(depth, cls, CAM, GEOM)
        mem = jnp.maximum(robots, jnp.zeros_like(robots))
        mem = jnp.maximum(jnp.zeros_like(robots), mem * decay)  # miss
        mem = jnp.maximum(robots, mem * decay)  # re-detected
        np.testing.assert_allclose(np.asarray(mem), np.asarray(robots))


class TestPlannerRepulsion:
    def test_remembered_wall_still_detours_the_path(self):
        """plan_on_device on a flat height goes straight to the ball (all
        turns ~0); adding a REMEMBERED robot wall between start and ball
        forces a detour (nonzero turns, longer path) even though the fresh
        frame saw no robot — the exact blackout scenario the memory exists
        for."""
        from tod_tpu.planner.tpu_relax import plan_on_device

        h, w = 48, 64
        balls = np.zeros((100, 4), np.float32)
        balls[0] = [32.0, 4.0, 30.0, 0.0]  # ball at (y=4, x=32)
        start = (47, 32)

        flat = jnp.zeros((h, w), jnp.float32)
        buf0 = np.asarray(
            plan_on_device(flat, jnp.asarray(balls), start, max_steps=256, signed=True)
        )
        n0 = int(buf0[0, 0])
        assert n0 > 0
        turns0 = np.abs(buf0[1 : 1 + n0, 1])
        assert turns0.max() < 1e-4  # straight up the column

        # remembered robot wall across rows 20..24, a gap only at the edges
        mem = np.zeros((h, w), np.float32)
        mem[20:25, 8:56] = 100.0
        remembered = jnp.maximum(flat, jnp.asarray(mem))
        buf1 = np.asarray(
            plan_on_device(
                remembered, jnp.asarray(balls), start, max_steps=512, signed=True
            )
        )
        n1 = int(buf1[0, 0])
        assert n1 > 0
        turns1 = np.abs(buf1[1 : 1 + n1, 1])
        assert turns1.max() > 0.3  # the path turns to route around the wall
        # and the detour is materially longer than the straight line
        assert buf1[1 : 1 + n1, 0].sum() > buf0[1 : 1 + n0, 0].sum() + 5.0


class TestEngineIntegration:
    def _cfg(self, **track_kw):
        from tod_tpu.core.config import (
            ModelConfig,
            PipelineConfig,
            PlannerConfig,
        )

        return PipelineConfig(
            camera=CameraConfig(width=64, height=48),
            model=ModelConfig(
                input_size=(48, 64), fpn_channels=16, proto_channels=16,
                head_channels=16, width_mult=0.35, num_prototypes=8,
                nms_top_k=8, max_detections=4,
            ),
            planner=PlannerConfig(backend="tpu", max_path_steps=128),
            tracker=TrackerConfig(enabled=True, obstacle_memory=0.8, **track_kw),
        )

    def test_memory_graph_threads_state(self):
        """(plan, tracks, mem) thread across dispatches; both state arrays
        are donated in place."""
        from tod_tpu.runtime.engine import Engine

        eng = Engine(self._cfg(), mode="detect", use_pallas=False)
        assert eng._obstacle_mem_mode
        packed = jnp.zeros((48 * 64 * 5,), jnp.uint8)
        tracks, mem = eng._init_tracks(), eng._init_obstacle_mem()
        assert mem.shape == (48, 64)
        out, tracks, mem = eng._serve_step_track_plan_mem(
            eng.params, packed, tracks, mem
        )
        assert out.shape[1] == 2 and tracks.shape == (8, 10)
        assert mem.shape == (48, 64)
        out, tracks, mem = eng._serve_step_track_plan_mem(
            eng.params, packed, tracks, mem
        )
        assert mem.dtype == jnp.float32

    def test_run_resets_memory_per_run(self):
        from tod_tpu.runtime.engine import Engine
        from tod_tpu.runtime.frame_source import SyntheticSource
        from tod_tpu.serve.server import PathStore

        cfg = self._cfg()
        eng = Engine(cfg, mode="detect", use_pallas=False)
        m = eng.run(
            SyntheticSource(cfg.camera, seed=0, n_frames=6),
            path_store=PathStore(), plan_paths=True, plan_every=2,
        )
        assert m["n_frames"] == 6 and m["plans_done"] >= 1
        assert eng._mem_d is not None and eng._mem_d.shape == (48, 64)

    def test_memory_requires_tracker(self):
        from tod_tpu.core.config import PipelineConfig, validate

        cfg = PipelineConfig(
            tracker=TrackerConfig(enabled=False, obstacle_memory=0.8)
        )
        assert any("obstacle_memory" in p for p in validate(cfg))

    def test_memory_decay_must_be_a_fraction(self):
        from tod_tpu.core.config import PipelineConfig, validate

        cfg = PipelineConfig(
            tracker=TrackerConfig(enabled=True, obstacle_memory=1.0)
        )
        assert any("obstacle_memory" in p for p in validate(cfg))
