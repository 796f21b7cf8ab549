"""Pipeline-parallel serving tests (parallel/pipeline.py).

The stage-split graph (forward on device A → head outputs over the wire →
detect/fusion/planner on device B) must reproduce the fused single-device
Engine plan, and the streaming loop must serve paths.
"""

import dataclasses

import jax
import numpy as np
import pytest

from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig
from tod_tpu.parallel.pipeline import TwoStagePipeline
from tod_tpu.runtime.frame_source import SyntheticSource
from tod_tpu.serve.server import PathStore

TINY = ModelConfig(
    input_size=(48, 64),
    fpn_channels=16,
    proto_channels=16,
    head_channels=16,
    width_mult=0.35,
    num_prototypes=8,
    dtype="float32",
)
CAM = CameraConfig(width=64, height=48)
CFG = PipelineConfig(camera=CAM, model=TINY)


def _require_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")


class TestTwoStagePipeline:
    def test_devices_actually_split(self):
        _require_2()
        pipe = TwoStagePipeline(CFG, seed=0)
        assert pipe.d_fwd != pipe.d_post
        frame = next(SyntheticSource(CAM, seed=3, n_frames=1).frames())
        plan = pipe.dispatch(frame.rgb, frame.depth)
        # the plan buffer comes back on the stage-2 device
        assert plan.devices() == {pipe.d_post}

    def test_plan_matches_fused_single_device_graph(self):
        """Stage-split == fused: same n_valid and total path cost per frame
        (paths may tie-break differently across separately-compiled
        programs, so the gate is cost, not the step sequence)."""
        _require_2()
        import jax.numpy as jnp

        from tod_tpu.runtime.engine import Engine

        eng = Engine(CFG, mode="detect", use_pallas=False, seed=0)
        pipe = TwoStagePipeline(CFG, seed=0)
        for a, b in zip(jax.tree.leaves(eng.params), jax.tree.leaves(pipe.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for seed in (3, 11):
            frame = next(SyntheticSource(CAM, seed=seed, n_frames=1).frames())
            h, w = frame.depth.shape
            packed = np.empty((h * w * 5,), np.uint8)
            packed[: h * w * 3] = frame.rgb.reshape(-1)
            packed[h * w * 3 :] = frame.depth.astype("<u2").view(np.uint8).reshape(-1)
            fused = np.asarray(eng._serve_step_plan(eng.params, jnp.asarray(packed)))
            split = np.asarray(pipe.dispatch(frame.rgb, frame.depth))
            assert int(split[0, 0]) == int(fused[0, 0]), f"seed {seed} n_valid"
            np.testing.assert_allclose(
                split[1:, 0].sum(), fused[1:, 0].sum(), rtol=1e-3,
                err_msg=f"seed {seed} total plan cost",
            )

    def test_streaming_loop_serves_paths(self):
        _require_2()
        pipe = TwoStagePipeline(CFG, seed=0)
        store = PathStore()
        src = SyntheticSource(CAM, seed=3, n_frames=5)
        m = pipe.run(src, n_frames=5, path_store=store, max_inflight=2)
        assert m["n_frames"] == 5
        assert m["fps"] > 0
        assert store.get().created > 0

    def test_single_device_fallback(self):
        """One device: both stages share it — still correct."""
        d = jax.devices()[0]
        pipe = TwoStagePipeline(CFG, devices=[d], seed=0)
        assert pipe.d_fwd == pipe.d_post == d
        frame = next(SyntheticSource(CAM, seed=3, n_frames=1).frames())
        plan = np.asarray(pipe.dispatch(frame.rgb, frame.depth))
        assert np.isfinite(plan).all()
