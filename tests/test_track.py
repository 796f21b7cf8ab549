"""Temporal ball tracker (tod_tpu/track): oracle equivalence, Kalman
convergence, lifecycle (birth/confirmation/coast/death), association, and
planner-seed emission.

The tracker is the temporal layer over the reference's per-frame planner
seeding (src/path.rs:37-49 reads Scene.balls rebuilt from scratch each frame,
pt_cloud.comp:78-82): detections flicker, tracks don't.  Everything here runs
the pure jnp bank (tod_tpu/track/tracker.py) against the sequential NumPy
oracle and against analytic expectations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.track import (
    TrackerConfig,
    init_tracks,
    track_update,
    track_update_oracle,
    tracks_to_balls,
)
from tod_tpu.track.tracker import ACTIVE, HITS, MISSES, VX, VY, X, Y

CFG = TrackerConfig(enabled=True, max_tracks=8)


def _balls(rows, max_balls=8):
    """Measurement slots: rows = [(x, y, cnt), ...] → (max_balls, 4) f32."""
    out = np.zeros((max_balls, 4), np.float32)
    for i, (x, y, c) in enumerate(rows):
        out[i, :3] = (x, y, c)
    return out


class TestOracleEquivalence:
    def test_random_trajectories_match_oracle(self):
        """500 random steps: the jnp bank equals the NumPy oracle bit-for-bit
        in structure (same assignments/births/deaths) and to f32 tolerance in
        the filter state."""
        rng = np.random.default_rng(0)
        t_jnp = init_tracks(CFG)
        t_np = np.array(t_jnp)
        step = jax.jit(lambda t, b: track_update(t, b, CFG))
        for i in range(500):
            n = rng.integers(0, 5)
            rows = [
                (rng.uniform(0, 320), rng.uniform(0, 240), rng.uniform(0, 40))
                for _ in range(n)
            ]
            balls = _balls(rows)
            t_jnp = step(t_jnp, balls)
            t_np = track_update_oracle(t_np, balls, CFG)
            np.testing.assert_allclose(
                np.array(t_jnp), t_np, rtol=1e-4, atol=1e-3,
                err_msg=f"diverged at step {i}",
            )

    def test_jit_no_recompile_across_steps(self):
        """Fixed shapes: one trace serves every step."""
        step = jax.jit(lambda t, b: track_update(t, b, CFG))
        t = init_tracks(CFG)
        t = step(t, _balls([(10, 10, 9)]))
        n0 = step._cache_size()
        t = step(t, _balls([(11, 11, 9), (50, 50, 9)]))
        assert step._cache_size() == n0


class TestKalman:
    def test_velocity_convergence_on_linear_motion(self):
        """A ball moving at constant (2, -1) cells/update: the velocity
        estimate converges and the predicted position tracks the truth."""
        t = init_tracks(CFG)
        pos = np.array([50.0, 120.0])
        vel = np.array([2.0, -1.0])
        for i in range(30):
            t = track_update(t, _balls([(pos[0], pos[1], 20)]), CFG)
            pos = pos + vel
        t = np.array(t)
        assert t[0, ACTIVE] == 1.0
        np.testing.assert_allclose(t[0, [VX, VY]], vel, atol=0.15)
        # after predict, position lands within a cell of the truth
        np.testing.assert_allclose(t[0, [X, Y]] + t[0, [VX, VY]], pos, atol=1.0)

    def test_smoothing_beats_raw_measurements(self):
        """Noisy stationary ball: the filtered position has lower error than
        the raw measurements it consumed."""
        cfg = TrackerConfig(enabled=True, accel_var=0.05)
        rng = np.random.default_rng(1)
        t = init_tracks(cfg)
        true = np.array([100.0, 80.0])
        errs_meas, errs_filt = [], []
        for i in range(60):
            z = true + rng.normal(0, 2.0, 2)
            t = track_update(t, _balls([(z[0], z[1], 20)]), cfg)
            if i >= 10:  # after burn-in
                errs_meas.append(np.linalg.norm(z - true))
                errs_filt.append(np.linalg.norm(np.array(t)[0, [X, Y]] - true))
        assert np.mean(errs_filt) < 0.6 * np.mean(errs_meas)


class TestLifecycle:
    def test_confirmation_gate_blocks_single_frame_flicker(self):
        """A one-frame false positive (hits=1 < min_hits=2) never seeds the
        planner."""
        t = init_tracks(CFG)
        t = track_update(t, _balls([(10, 10, 9)]), CFG)
        slots = np.array(tracks_to_balls(t, CFG, max_balls=100))
        assert (slots[:, 2] == 0).all()
        # second hit confirms
        t = track_update(t, _balls([(10.5, 10.2, 9)]), CFG)
        slots = np.array(tracks_to_balls(t, CFG, max_balls=100))
        assert (slots[:, 2] > 0).sum() == 1
        assert slots[0, 2] > 3.0  # clears plan_on_device's min_pixels gate

    def test_coast_through_occlusion_with_prediction(self):
        """A moving ball occluded for 5 updates: the track survives, coasting
        along its velocity estimate; it dies only past max_misses."""
        cfg = TrackerConfig(enabled=True, max_misses=6)
        t = init_tracks(cfg)
        pos = np.array([50.0, 50.0])
        vel = np.array([3.0, 0.0])
        for _ in range(20):
            t = track_update(t, _balls([(pos[0], pos[1], 20)]), cfg)
            pos = pos + vel
        empty = _balls([])
        for _ in range(5):  # occluded
            t = track_update(t, empty, cfg)
            pos = pos + vel
        arr = np.array(t)
        assert arr[0, ACTIVE] == 1.0 and arr[0, MISSES] == 5.0
        # coasted position stays near the (moving) truth
        assert np.linalg.norm(arr[0, [X, Y]] - pos) < 4.0
        # still a confirmed planner seed while coasting
        slots = np.array(tracks_to_balls(t, cfg, max_balls=100))
        assert (slots[:, 2] > 0).sum() == 1
        for _ in range(2):  # 6th and 7th miss: 7 > max_misses → death
            t = track_update(t, empty, cfg)
        assert np.array(t)[0, ACTIVE] == 0.0

    def test_death_frees_slot_for_rebirth(self):
        cfg = TrackerConfig(enabled=True, max_tracks=2, max_misses=1)
        t = init_tracks(cfg)
        for _ in range(3):
            t = track_update(t, _balls([(10, 10, 9), (200, 200, 9)]), cfg)
        for _ in range(3):
            t = track_update(t, _balls([]), cfg)
        assert (np.array(t)[:, ACTIVE] == 0).all()
        t = track_update(t, _balls([(99, 99, 9)]), cfg)
        arr = np.array(t)
        assert arr[:, ACTIVE].sum() == 1.0 and arr[0, X] == 99.0


class TestAssociation:
    def test_two_parallel_balls_keep_identity(self):
        """Two balls moving in parallel lanes never swap tracks."""
        t = init_tracks(CFG)
        a, b = np.array([20.0, 40.0]), np.array([20.0, 160.0])
        v = np.array([4.0, 0.0])
        for i in range(25):
            # present in random order — slot order must not matter
            rows = [(a[0], a[1], 20), (b[0], b[1], 20)]
            if i % 2:
                rows = rows[::-1]
            t = track_update(t, _balls(rows), CFG)
            a, b = a + v, b + v
        arr = np.array(t)
        ys = sorted(arr[arr[:, ACTIVE] > 0][:, Y])
        assert len(ys) == 2
        assert abs(ys[0] - a[1]) < 3 and abs(ys[1] - b[1]) < 3

    def test_gate_rejects_distant_measurement(self):
        """A measurement outside the gate starts a NEW track instead of
        teleporting an existing one."""
        cfg = TrackerConfig(enabled=True, gate=20.0)
        t = init_tracks(cfg)
        for _ in range(3):
            t = track_update(t, _balls([(50, 50, 9)]), cfg)
        t = track_update(t, _balls([(150, 150, 9)]), cfg)
        arr = np.array(t)
        active = arr[arr[:, ACTIVE] > 0]
        assert len(active) == 2  # old track coasting + newborn
        assert np.linalg.norm(active[0, [X, Y]] - [50, 50]) < 3
        assert np.linalg.norm(active[1, [X, Y]] - [150, 150]) < 0.1

    def test_nearest_wins_when_contended(self):
        """Two tracks, one measurement between them but nearer to track A:
        A gets it, B coasts."""
        t = init_tracks(CFG)
        for _ in range(3):
            t = track_update(t, _balls([(100, 100, 9), (100, 140, 9)]), CFG)
        t = track_update(t, _balls([(100, 112, 9)]), CFG)
        arr = np.array(t)
        assert arr[0, MISSES] == 0.0  # A matched
        assert arr[1, MISSES] == 1.0  # B coasted


class TestSeedEmission:
    def test_slot_format_feeds_device_planner(self):
        """tracks_to_balls output drives plan_on_device end to end: the
        planned path walks toward the TRACK position (coasted), not the
        stale measurement."""
        from tod_tpu.planner.tpu_relax import plan_on_device

        cfg = TrackerConfig(enabled=True)
        t = init_tracks(cfg)
        for _ in range(4):
            t = track_update(t, _balls([(24.0, 8.0, 30)]), cfg)
        slots = tracks_to_balls(t, cfg, max_balls=100)
        height = jnp.zeros((48, 64), jnp.float32)
        buf = np.array(
            plan_on_device(height, slots, start_yx=(47, 32), max_steps=256)
        )
        n = int(buf[0, 0])
        assert n > 0  # a path was planned to the tracked ball

    def test_max_balls_smaller_than_tracks_raises(self):
        with pytest.raises(ValueError):
            tracks_to_balls(init_tracks(CFG), CFG, max_balls=4)


class TestEngineIntegration:
    def _cfg(self, **track_kw):
        from tod_tpu.core.config import (
            CameraConfig,
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
            tracker=TrackerConfig(enabled=True, **track_kw),
        )

    def test_tracked_serve_step_threads_state(self):
        """The fused tracked graph returns (plan buffer, new track bank) and
        the bank carries across dispatches (donated in place)."""
        from tod_tpu.runtime.engine import Engine

        eng = Engine(self._cfg(), mode="detect", use_pallas=False)
        h, w = 48, 64
        packed = jnp.zeros((h * w * 5,), jnp.uint8)
        tracks = eng._init_tracks()
        out, tracks = eng._serve_step_track_plan(eng.params, packed, tracks)
        assert out.shape[1] == 2 and tracks.shape == (8, 10)
        out, tracks2 = eng._serve_step_track_plan(eng.params, packed, tracks)
        assert tracks2.shape == (8, 10)

    def test_run_with_tracker_produces_plans(self):
        """engine.run(plan_every=2) with the tracker enabled streams frames
        and plans without error; the per-run bank is reset each run."""
        from tod_tpu.runtime.engine import Engine
        from tod_tpu.runtime.frame_source import SyntheticSource
        from tod_tpu.serve.server import PathStore

        cfg = self._cfg()
        eng = Engine(cfg, mode="detect", use_pallas=False)
        store = PathStore()
        m = eng.run(
            SyntheticSource(cfg.camera, seed=0, n_frames=6),
            path_store=store, plan_paths=True, plan_every=2,
        )
        assert m["n_frames"] == 6 and m["plans_done"] >= 1
        assert eng._tracks_d is not None and eng._tracks_d.shape == (8, 10)

    def test_tracker_requires_device_planner(self):
        from tod_tpu.core.config import PipelineConfig, PlannerConfig
        from tod_tpu.runtime.engine import Engine

        cfg = PipelineConfig(
            planner=PlannerConfig(backend="numpy"),
            tracker=TrackerConfig(enabled=True),
        )
        with pytest.raises(ValueError, match="device planner"):
            Engine(cfg, mode="detect", use_pallas=False)

    def test_run_without_plan_every_raises(self):
        from tod_tpu.runtime.engine import Engine
        from tod_tpu.runtime.frame_source import SyntheticSource

        cfg = self._cfg()
        eng = Engine(cfg, mode="detect", use_pallas=False)
        with pytest.raises(ValueError, match="plan_every"):
            eng.run(
                SyntheticSource(cfg.camera, seed=0, n_frames=2),
                plan_paths=True, warmup=False,
            )

    def test_validate_rejects_tracks_over_ball_slots(self):
        from tod_tpu.core.config import GeometryConfig, PipelineConfig, validate

        cfg = PipelineConfig(
            geometry=GeometryConfig(max_balls=4),
            tracker=TrackerConfig(enabled=True, max_tracks=8),
        )
        assert any("max_tracks" in p for p in validate(cfg))
