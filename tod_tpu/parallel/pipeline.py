"""Pipeline-parallel serving: stage-split the frame graph across devices.

The fourth parallelism axis (after dp / tp / spatial — parallel/__init__.py).
DP batching raises throughput but not single-frame latency headroom: a
batch-1 control loop can't wait for a batch to fill.  Pipeline parallelism
splits the per-frame work itself across chips:

    stage 1 (device A): preprocess → YOLACT forward        (~70% of step time)
    stage 2 (device B): detect → geometry fusion → planner (~30%)

The host dispatches stage 1 for frame n, moves the head outputs A→B with one
async ``jax.device_put`` (ICI), and dispatches stage 2 — JAX's async dispatch
overlaps frame n's stage 1 with frame n−1's stage 2 automatically, so
steady-state throughput approaches ``1/max(stage)`` instead of ``1/sum``
while each chip holds only its stage's working set.  This is the coarse
producer/consumer pipeline the reference built from tokio queues between
HETEROGENEOUS devices (Coral → VideoCore GPU, src/main.rs:56-96,
SURVEY.md §2.4 "coarse pipeline") re-expressed across homogeneous TPU chips.

The stage boundary is the natural one: YolactOutputs is the smallest
inter-stage tensor set (loc/conf/coeff/protos/sem ≈ 1.5 MB at QVGA — far
less than the raw activations inside the backbone), and stage 2 is
parameter-free (anchors are compile-time constants), so only stage 1's
params live on device A and nothing re-replicates.

Validated per stage-split equivalence vs the fused single-device graph in
tests/test_pipeline_parallel.py and exercised on the virtual mesh by
``__graft_entry__.dryrun_multichip``.  On this environment only one real
chip exists; two-chip wall-clock numbers require real ICI.
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.core.config import PipelineConfig
from tod_tpu.geometry.fusion import fuse_scene
from tod_tpu.models.yolact import create_model, detect
from tod_tpu.ops.preprocess import preprocess_frame


class TwoStagePipeline:
    """Stage-split serving over two devices.

    ``devices``: (stage1_device, stage2_device); defaults to the first two
    JAX devices.  With one device available both stages share it — correct,
    but the overlap win needs two chips (the single-chip configuration only
    measures the split's dispatch overhead).
    """

    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        devices=None,
        params: Any = None,
        seed: int = 0,
        use_pallas: bool = False,
    ):
        self.cfg = cfg or PipelineConfig()
        devs = list(devices) if devices is not None else jax.devices()[:2]
        if not devs:
            raise ValueError("need at least one device")
        self.d_fwd = devs[0]
        self.d_post = devs[-1]
        self.model, self.anchors = create_model(self.cfg.model)

        from tod_tpu.runtime.engine import prepare_serving_params

        params = prepare_serving_params(self.model, self.cfg, params, seed)
        # stage 1's params live on device A only (stage 2 is parameter-free)
        self.params = jax.device_put(params, self.d_fwd)

        mcfg = self.cfg.model
        cam, geom, pcfg = self.cfg.camera, self.cfg.geometry, self.cfg.planner
        cam_hw = (cam.height, cam.width)
        model, anchors = self.model, self.anchors

        from tod_tpu.planner.dijkstra import start_node_yx
        from tod_tpu.planner.tpu_relax import plan_on_device

        start_yx = start_node_yx(cam_hw, offset=pcfg.start_offset)

        def _stage1(p, rgb):
            """(H, W, 3) u8 → YolactOutputs (the inter-stage tensor set)."""
            x = preprocess_frame(rgb, mcfg.input_size, jnp.dtype(mcfg.dtype))
            return model.apply(p, x, train=False)

        def _stage2(outputs, depth):
            """YolactOutputs + (H, W) u16 depth → (max_steps+1, 2) plan."""
            dets = detect(outputs, mcfg, anchors, out_hw=cam_hw, use_pallas=use_pallas)
            scene = fuse_scene(
                depth, dets.class_map, dets.id_map, cam, geom, use_pallas=use_pallas
            )
            return plan_on_device(
                scene.height.astype(jnp.float32),
                scene.balls,
                start_yx,
                max_seeds=pcfg.max_seed_balls,
                min_pixels=pcfg.min_ball_pixels,
                max_steps=pcfg.max_path_steps,
                max_iters=pcfg.tpu_max_iters,
                signed=pcfg.signed_turns,
            )

        # placement follows committed inputs: stage 1's params/frames live on
        # d_fwd, stage 2's activations/depth on d_post — jit compiles one
        # executable per device with no cross-device collectives inside
        self._stage1 = jax.jit(_stage1)
        self._stage2 = jax.jit(_stage2)

    def dispatch(self, rgb_np: np.ndarray, depth_np: np.ndarray):
        """One frame through both stages (all transfers + dispatches async);
        returns the device-resident plan buffer on the stage-2 device."""
        rgb = jax.device_put(np.ascontiguousarray(rgb_np, np.uint8), self.d_fwd)
        depth = jax.device_put(np.ascontiguousarray(depth_np, np.uint16), self.d_post)
        out = self._stage1(self.params, rgb)
        # the A→B hop: one async transfer of the head-output pytree over ICI
        out = jax.device_put(out, self.d_post)
        return self._stage2(out, depth)

    def warmup(self) -> float:
        h, w = self.cfg.camera.height, self.cfg.camera.width
        t0 = time.perf_counter()
        plan = self.dispatch(
            np.zeros((h, w, 3), np.uint8), np.zeros((h, w), np.uint16)
        )
        jax.block_until_ready(plan)
        return time.perf_counter() - t0

    def run(
        self,
        source,
        n_frames: int | None = None,
        path_store=None,
        warmup: bool = True,
        max_inflight: int | None = 4,
    ) -> dict:
        """Streaming loop: every frame plans (pipeline mode is a latency
        product).  ``max_inflight`` bounds total in-flight frames across both
        stages; the freshest plan lands in ``path_store``."""
        from collections import deque

        from tod_tpu.planner.api import materialize_path

        compile_s = self.warmup() if warmup else 0.0
        inflight: "deque" = deque()
        n_done = 0
        last_plan_d = None
        t0 = time.perf_counter()
        for frame in source.frames():
            if n_frames is not None and n_done >= n_frames:
                break
            plan_d = self.dispatch(frame.rgb, frame.depth)
            last_plan_d = plan_d
            inflight.append(plan_d)
            if max_inflight is not None and len(inflight) > max_inflight:
                done_d = inflight.popleft()
                jax.block_until_ready(done_d)
                if path_store is not None:
                    path_store.set(materialize_path(done_d))
            n_done += 1
        # drain
        for plan_d in inflight:
            jax.block_until_ready(plan_d)
        if path_store is not None and last_plan_d is not None:
            path_store.set(materialize_path(last_plan_d))
        wall = time.perf_counter() - t0
        return {
            "n_frames": n_done,
            "wall_s": wall,
            "fps": n_done / wall if wall > 0 else 0.0,
            "compile_s": compile_s,
            "stage1_device": str(self.d_fwd),
            "stage2_device": str(self.d_post),
        }
