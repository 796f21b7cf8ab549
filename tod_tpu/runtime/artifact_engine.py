"""Engine-compatible serving from a frozen ``.todx`` artifact.

The reference's production deployment is "load a frozen blob, serve"
(reference src/yolact.rs:18-20 — the tflite file IS the deployed model).
Round 4 had that split across two programs: ``tod_tpu.app`` (supervision,
GetStat, hardening, multistream — but always jit-compiles an Engine) and
``tod_tpu.deploy serve`` (loads the ``.todx`` — but a minimal loop with no
watchdog or hardening).  This module joins them (VERDICT r4 item 1a):
:class:`ArtifactEngine` wraps a loaded :class:`~tod_tpu.deploy.ServingArtifact`
in the :class:`~tod_tpu.runtime.engine.Engine` serving interface, so
``python -m tod_tpu.app --todx model.todx`` gets the production loop —
``run_supervised`` watchdog restarts, the full ``serve/server.py`` protocol
(GetStat/AuthTok/TLS), bounded dispatch, in-stream planning — with ZERO XLA
compile when the artifact embeds an AOT executable for this machine.

Design: ``Engine.run``/``run_supervised`` only touch a narrow surface of the
engine (the serve-step callables, ``_plan_on_device_mode``, ``cfg``,
``timer``/``fps``, ``_unpack_plan_buffer``); ArtifactEngine subclasses Engine
but skips its ``__init__`` entirely — no model is constructed, no tod_tpu
model code executes (the deployment-host property of ``deploy.serve_artifact``
is preserved).  Per artifact mode:

- ``"plan"``   the frozen graph IS the fused frame+plan step.  Every frame
               dispatches it (there is no separate frame-only graph in the
               artifact); plans are materialized every ``plan_every``-th
               frame.  Requires ``plan_every`` (in-stream planning).
- ``"track_plan"`` (round 5) the TRACKED fused frame+plan step with the
               Kalman bank threaded through the artifact's signature
               (``(packed, bank) → (plan, bank)``); the run loop carries
               the bank exactly as the live tracked Engine does.  Exported
               with ``deploy export --track``.
- ``"scene"``  host planning from the artifact's (height, balls) outputs —
               the planner worker runs the same host planner the Engine uses.
- ``"packed"`` host planning from the wire-packed u8 readback (the Engine's
               own ``_serve_step_packed`` contract).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from tod_tpu.core.config import (
    CameraConfig,
    ModelConfig,
    PipelineConfig,
    ServerConfig,
)
from tod_tpu.runtime.engine import Engine
from tod_tpu.runtime.profiler import FPSMeter, StageTimer


def pipeline_config_from_meta(meta: dict, server: ServerConfig | None = None) -> PipelineConfig:
    """Rebuild the serving-relevant PipelineConfig an artifact was exported
    with: camera dims from the packed-input contract, planner semantics from
    the frozen header (signed turns, start column, caps — deploy.py), model
    facts for display.  ``track_plan`` artifacts (round 5) re-enable the
    tracker: the Kalman bank threads through the frozen graph's signature
    (state can't live in HBM across exported-executable calls), sized from
    the header's ``tracker`` block."""
    from tod_tpu.core.config import TrackerConfig
    from tod_tpu.deploy import planner_config_from_meta

    cam_meta = meta["camera"]
    model_meta = meta.get("model", {})
    kwargs: dict[str, Any] = {}
    if server is not None:
        kwargs["server"] = server
    tk = meta.get("tracker")
    if tk:
        kwargs["tracker"] = TrackerConfig(
            enabled=True, max_tracks=int(tk["max_tracks"])
        )
    return PipelineConfig(
        camera=CameraConfig(width=cam_meta["width"], height=cam_meta["height"]),
        model=ModelConfig(
            input_size=tuple(
                model_meta.get(
                    "input_size",
                    (cam_meta["height"] // 8 * 8, cam_meta["width"] // 8 * 8),
                )
            ),
            quantized=bool(model_meta.get("quantized", False)),
            backbone=model_meta.get("backbone", "mobilenetv2"),
        ),
        planner=planner_config_from_meta(meta),
        **kwargs,
    )


class ArtifactEngine(Engine):
    """Drive the production serving loop from a frozen artifact.

    Duck-types the Engine surface that ``run``/``run_supervised`` and the
    app's GetStat hook consume; never builds the model or compiles the
    serving graphs (``boot == "aot"`` artifacts execute with zero XLA
    compile — the reference's frozen-blob boot, src/yolact.rs:18-20).
    """

    def __init__(self, artifact, server: ServerConfig | None = None):
        # deliberately NOT calling Engine.__init__: no model, no jit
        self.artifact = artifact
        self.meta = artifact.meta
        self.cfg = pipeline_config_from_meta(artifact.meta, server=server)
        self.mode = artifact.meta.get("engine_mode", "detect")
        self.boot = artifact.boot
        self.params = None  # the weights live inside the frozen graph
        self.use_pallas = False
        self.timer = StageTimer()
        self.fps = FPSMeter()
        self._tracks_d = None
        self._mem_d = None
        self._obstacle_mem_mode = False

        amode = artifact.meta["mode"]
        if amode == "plan":
            # the frozen graph already ends in the on-device planner: run()
            # treats it as device-planner mode, where every plan_every-th
            # dispatch IS the plan and the readback is the ~8 KB plan buffer
            self._plan_on_device_mode = True
            step = lambda p, packed: artifact.call(packed)  # noqa: E731
            self._serve_step_plan = step
            # there is no frame-only graph in a plan artifact — off-cadence
            # frames run the same graph (its plan output is simply never
            # materialized; the extra device time is the planner stage the
            # export chose to freeze in)
            self._serve_step_scene = step
        elif amode == "track_plan":
            # tracked fused frame+plan: run()'s tracked path calls
            # (params, packed, tracks) → (plan, new_tracks) and threads the
            # bank — exactly the frozen graph's signature.  Off-cadence
            # frames run with the CURRENT bank and discard its update (the
            # tracker steps once per planning dispatch, the Engine
            # contract; the frozen executable does not donate, so reusing
            # the bank buffer is safe).
            self._plan_on_device_mode = True
            self._serve_step_track_plan = (
                lambda p, packed, tr: artifact.call(packed, tr)
            )
            self._init_tracks = artifact.init_tracks
            self._serve_step_scene = (
                lambda p, packed: artifact.call(packed, self._tracks_d)[0]
            )
        elif amode in ("scene", "packed"):
            self._plan_on_device_mode = False
            self._serve_step_packed = lambda p, packed: artifact.call(packed)  # noqa: E731
        else:
            raise ValueError(f"unknown artifact mode {amode!r}")
        self._amode = amode

    # -- Engine surface overrides ------------------------------------------

    def warmup(self, plan_standalone: bool = True) -> float:
        """First dispatch of the frozen graph with a value readback — program
        load for AOT artifacts, XLA compile of the portable payload for
        ``boot == "jit"`` loads.  Same contract as Engine.warmup (returns
        seconds; records the per-graph breakdown)."""
        import jax

        h, w = self.cfg.camera.height, self.cfg.camera.width
        packed = jax.device_put(np.zeros((h * w * 5,), np.uint8))
        t0 = time.perf_counter()
        if self._amode == "track_plan":
            out = self.artifact.call(packed, self.artifact.init_tracks())
        else:
            out = self.artifact.call(packed)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)  # value readback: the graph really executed
        dt = time.perf_counter() - t0
        self.warmup_breakdown = {f"artifact_{self._amode}": round(dt, 2)}
        return dt

    def _plan_payload(self, out_d):
        raise RuntimeError(
            "ArtifactEngine plans in-stream (plan artifacts) or on host "
            "(scene/packed) — the standalone sync-point plan graph would "
            "need an XLA compile, defeating the frozen-artifact boot.  "
            "Pass plan_every >= 1."
        )

    def _unpack_plan_buffer(self, buf):
        if self._amode == "scene":
            # artifact.call returned (height f32 (H,W), balls (N,4)) — the
            # planner worker np.asarray'd the tuple's first element; undo by
            # accepting either the tuple or the materialized pair
            height, balls = buf
            return np.asarray(height), np.asarray(balls)
        return super()._unpack_plan_buffer(buf)

    def run(self, source, **kw):
        if kw.get("plan_paths", True) and kw.get("plan_every") is None:
            raise ValueError(
                "ArtifactEngine requires plan_every >= 1 (in-stream/host "
                "planning; the sync-point plan graph is not frozen into "
                "artifacts)"
            )
        return super().run(source, **kw)

    def process(self, frame):
        raise RuntimeError(
            "ArtifactEngine serves the frozen graph only; process() needs "
            "the full Engine (scene debug dumps are an Engine feature)"
        )
