"""The streaming engine: frame → masks → scene → path, end to end.

Replaces the reference's orchestration layer (``manage``'s queues + tasks,
src/main.rs:33-97) with a host loop around ONE fused, jit-compiled device graph
per frame: preprocess → YOLACT → detection cleanup → geometry fusion.  Nothing
round-trips to host between the model and the geometry kernels (the reference
crossed Coral→CPU→GPU→CPU every frame, SURVEY.md §2.5); the only readback is the
final Scene for the host planner.

Pipelining: jax dispatch is async — while the device runs frame n, the host
pops/uploads frame n+1 and runs the planner on scene n−1's readback.  The
explicit double-buffering that the reference built from tokio queues
(src/scene.rs:102-109) falls out of the dispatch model.
"""

from __future__ import annotations

import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.core.config import PipelineConfig
from tod_tpu.core.types import Detections, Frame, Path, Scene
from tod_tpu.geometry.fusion import fuse_scene
from tod_tpu.models.yolact import create_model, detect
from tod_tpu.ops.cc_labels import connected_components
from tod_tpu.ops.postprocess import semantic_argmax, upsample_nearest
from tod_tpu.ops.preprocess import preprocess_frame, upscale_to_frame
from tod_tpu.planner.api import plan
from tod_tpu.runtime.profiler import FPSMeter, StageTimer
from tod_tpu.serve.server import PathStore


class Engine:
    """Builds and drives the fused per-frame device graph.

    mode:
    - ``"detect"``    full YOLACT path: boxes + instance masks + class/id maps
    - ``"semantic"``  reference-parity path: semantic argmax of the sem head +
                      connected-component ids (what src/yolact.rs:90-131
                      actually shipped)
    """

    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        params: Any = None,
        mode: str = "detect",
        use_pallas: bool | None = None,
        seed: int = 0,
    ):
        self.cfg = cfg or PipelineConfig()
        self.mode = mode
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.model, self.anchors = create_model(self.cfg.model)
        cam_hw = (self.cfg.camera.height, self.cfg.camera.width)
        if params is None:
            x0 = jnp.zeros((1, *self.cfg.model.input_size, 3), jnp.bfloat16)
            # jit the init: eager init dispatches thousands of tiny ops, which
            # is pathological over a remote-compile TPU tunnel
            params = jax.jit(lambda k: self.model.init(k, x0, train=False))(
                jax.random.PRNGKey(seed)
            )
        self.params = params
        self.timer = StageTimer()
        self.fps = FPSMeter()

        mcfg = self.cfg.model
        cam, geom = self.cfg.camera, self.cfg.geometry
        model, anchors = self.model, self.anchors
        use_pl = self.use_pallas

        if mode == "detect":

            def _step(p, rgb, depth):
                x = preprocess_frame(rgb, mcfg.input_size, jnp.dtype(mcfg.dtype))
                out = model.apply(p, x, train=False)
                dets = detect(out, mcfg, anchors, out_hw=cam_hw, use_pallas=use_pl)
                scene = fuse_scene(
                    depth, dets.class_map, dets.id_map, cam, geom, use_pallas=use_pl
                )
                return scene, dets

        elif mode == "semantic":

            def _step(p, rgb, depth):
                x = preprocess_frame(rgb, mcfg.input_size, jnp.dtype(mcfg.dtype))
                out = model.apply(p, x, train=False)
                cls_small = semantic_argmax(
                    out.sem_logits[0], mcfg.meaningful_classes
                )
                cls_in = upsample_nearest(cls_small, 8)  # back to input size
                cls_map = upscale_to_frame(cls_in, cam_hw).astype(jnp.uint8)
                ids = connected_components(cls_map == 3, max_labels=geom.max_balls)
                scene = fuse_scene(depth, cls_map, ids, cam, geom, use_pallas=use_pl)
                dets = _empty_detections(mcfg, cam_hw, cls_map, ids)
                return scene, dets

        else:
            raise ValueError(f"unknown mode {mode!r}")

        self._step = jax.jit(_step)

    def warmup(self) -> float:
        """Compile the graph on a dummy frame; returns compile seconds."""
        h, w = self.cfg.camera.height, self.cfg.camera.width
        rgb = jnp.zeros((h, w, 3), jnp.uint8)
        depth = jnp.zeros((h, w), jnp.uint16)
        t0 = time.perf_counter()
        scene, dets = self._step(self.params, rgb, depth)
        jax.block_until_ready(scene.height)
        return time.perf_counter() - t0

    def process(self, frame: Frame) -> tuple[Scene, Detections]:
        """One frame through the device graph (device-resident outputs)."""
        rgb = jnp.asarray(frame.rgb)
        depth = jnp.asarray(frame.depth)
        return self._step(self.params, rgb, depth)

    def run(
        self,
        source,
        n_frames: int | None = None,
        path_store: Optional[PathStore] = None,
        plan_paths: bool = True,
        warmup: bool = True,
    ) -> dict:
        """Drive the full loop; returns metrics (fps, p50 latency, stages)."""
        if warmup:
            compile_s = self.warmup()
        else:
            compile_s = 0.0
        frames: Iterator[Frame] = source.frames()
        n_done = 0
        pending = None  # (scene, dets) dispatched but not consumed
        last_path: Path | None = None
        t_start = time.perf_counter()
        while n_frames is None or n_done < n_frames:
            frame = next(frames, None)
            if frame is None:
                break
            t0 = time.perf_counter()
            scene, dets = self.process(frame)  # async dispatch
            if pending is not None:
                self._consume(pending, path_store, plan_paths)
            pending = (scene, dets)
            jax.block_until_ready(scene.height)
            self.timer.record("frame", time.perf_counter() - t0)
            self.fps.tick()
            n_done += 1
            if path_store is not None:
                last_path = path_store.get()
        if pending is not None:
            last_path = self._consume(pending, path_store, plan_paths) or last_path
        wall = time.perf_counter() - t_start
        return {
            "n_frames": n_done,
            "wall_s": wall,
            "fps": n_done / wall if wall > 0 else 0.0,
            "compile_s": compile_s,
            "stages": self.timer.summary(),
            "last_path_len": len(last_path.directions) if last_path else 0,
        }

    def _consume(self, pending, path_store, plan_paths):
        scene, _ = pending
        if not plan_paths:
            return None
        with self.timer.stage("plan"):
            host_scene = Scene(
                height=np.asarray(scene.height),
                pos=np.asarray(scene.pos),
                balls=np.asarray(scene.balls),
                connections=np.asarray(scene.connections),
            )
            path = plan(host_scene, self.cfg.planner)
        if path_store is not None:
            path_store.set(path)
        return path


def _empty_detections(mcfg, cam_hw, cls_map, ids) -> Detections:
    n = mcfg.max_detections
    hm = (cam_hw[0] // 4, cam_hw[1] // 4)
    return Detections(
        boxes=jnp.zeros((n, 4), jnp.float32),
        scores=jnp.zeros((n,), jnp.float32),
        classes=jnp.zeros((n,), jnp.int32),
        masks=jnp.zeros((n, *hm), jnp.float32),
        valid=jnp.zeros((n,), bool),
        class_map=cls_map,
        id_map=ids,
    )
