"""Watchdog RECOVERY tests (VERDICT r2 item 8): a stalled frame source is
detected, torn down, and replaced without process death — the reference
fail-fasts on every error (SURVEY.md §5: expect/unwrap, no retry, no
watchdog), so 'exceeding' it means actually recovering, not logging."""

import time

import numpy as np

from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig, PlannerConfig
from tod_tpu.core.types import Frame
from tod_tpu.runtime import Engine
from tod_tpu.runtime.frame_source import SyntheticSource


class HangingSource:
    """Yields ``n_good`` frames, then hangs mid-stream (the unplugged-camera
    failure mode) until closed."""

    def __init__(self, cam: CameraConfig, n_good: int = 3):
        self.cam = cam
        self.n_good = n_good
        self._closed = False

    def frames(self):
        rng = np.random.default_rng(0)
        for _ in range(self.n_good):
            yield Frame(
                rgb=rng.integers(0, 255, (self.cam.height, self.cam.width, 3), np.uint8),
                depth=np.full((self.cam.height, self.cam.width), 1200, np.uint16),
            )
        while not self._closed:  # wedged producer: alive but yields nothing
            time.sleep(0.05)

    def close(self):
        self._closed = True


def _tiny_cfg():
    cam = CameraConfig(width=64, height=48)
    return PipelineConfig(
        camera=cam,
        model=ModelConfig(
            input_size=(48, 64), fpn_channels=16, proto_channels=16,
            head_channels=16, width_mult=0.35, num_prototypes=8,
        ),
        planner=PlannerConfig(backend="numpy"),
    )


class TestSupervisedRecovery:
    def test_stalled_source_restarts_and_completes(self):
        cfg = _tiny_cfg()
        eng = Engine(cfg, mode="semantic", use_pallas=False)
        made = []

        def factory():
            if not made:
                src = HangingSource(cfg.camera, n_good=3)
            else:
                src = SyntheticSource(cfg.camera, seed=1, n_frames=50)
            made.append(src)
            return src

        metrics = eng.run_supervised(
            factory, n_frames=8, max_restarts=2, stall_timeout_s=1.0,
            sync_every=4, plan_every=2,
        )
        # the supervisor must tear the WEDGED source down itself before
        # opening its replacement (a leaked camera handle blocks reopen)
        assert made[0]._closed, "run_supervised leaked the stalled source"
        assert metrics["restarts"] == 1, metrics
        assert metrics["n_frames"] == 8, metrics
        assert eng.restarts == 1
        assert metrics["plans_done"] >= 1

    def test_healthy_run_never_restarts(self):
        cfg = _tiny_cfg()
        eng = Engine(cfg, mode="semantic", use_pallas=False)
        metrics = eng.run_supervised(
            lambda: SyntheticSource(cfg.camera, seed=2, n_frames=4),
            n_frames=4, max_restarts=2, stall_timeout_s=30.0, plan_every=2,
        )
        assert metrics["restarts"] == 0
        assert metrics["n_frames"] == 4

    def test_bounded_retries_give_up(self):
        cfg = _tiny_cfg()
        eng = Engine(cfg, mode="semantic", use_pallas=False)
        made = []

        def always_hanging():
            src = HangingSource(cfg.camera, n_good=1)
            made.append(src)
            return src

        t0 = time.monotonic()
        metrics = eng.run_supervised(
            always_hanging, n_frames=100, max_restarts=2, stall_timeout_s=0.8,
        )
        assert all(s._closed for s in made), "supervisor leaked a source"
        assert metrics["restarts"] == 2  # gave up after the bound
        assert metrics["n_frames"] == 3  # one good frame per attempt
        assert time.monotonic() - t0 < 60
