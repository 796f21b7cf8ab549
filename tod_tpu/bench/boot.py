"""Boot-to-first-plan: the robot's cold-start product metric.

The reference boots in seconds — it loads a frozen, pre-compiled tflite blob
(reference src/yolact.rs:18-20) and the first camera frame flows immediately.
A JAX serving host instead pays interpreter + device-runtime init + XLA
compile before the first plan can be served, so this is a first-class number
to measure and attack (VERDICT r3 item 2), not an implementation detail.

Run as a CHILD process so the measurement includes everything a real boot
pays (python + jax import, device/tunnel dial, checkpoint load, compile or
cache/AOT load, first frame → first Path)::

    TOD_BOOT_T0=$(date +%s.%N) python -m tod_tpu.bench.boot [--todx ART] \
        [--checkpoint DIR] [--cache DIR] [--width W --height H]

``TOD_BOOT_T0`` is the parent's clock immediately before exec; the script
prints one JSON line with ``boot_to_first_plan_s`` measured against it (or
against its own import time when unset).  Three boot paths:

- default: build the Engine and compile ONLY the fused frame+plan serving
  graph (what a plan-serving robot needs) — cold when ``--cache`` points at
  an empty dir, warm when it points at a populated persistent cache;
- ``--todx``: load a frozen artifact; with an embedded AOT executable for
  this machine the boot pays ZERO XLA compile (deploy.py).

The repo-root ``bench.py`` runs all three on the real chip and records
``boot_cold_s`` / ``boot_warm_s`` / ``boot_aot_s``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_T0 = float(os.environ.get("TOD_BOOT_T0", time.time()))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--todx", default=None, help="boot from a frozen artifact")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--cache", default=None, help="persistent compile cache dir")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    args = p.parse_args(argv)

    # stage clock: where does a boot actually spend its time?  Each entry is
    # the stage's own duration; "python" is interpreter start → this module.
    stages = {"python": round(time.time() - _T0, 2)}
    t_prev = time.time()

    def stage(name):
        nonlocal t_prev
        now = time.time()
        stages[name] = round(now - t_prev, 2)
        t_prev = now

    # overlap the checkpoint restore with the device/tunnel dial: the restore
    # is host disk+CPU, the dial waits on the network — round 4 measured a
    # constant ~5.5-5.9 s "checkpoint_and_engine" stage paid serially after
    # the dial (VERDICT r4 item 7: warm boot < 10 s).  The thread only loads
    # bytes (msgpack sidecar / orbax → host numpy); device placement happens
    # in Engine construction after the dial as before.
    ckpt_box: dict = {}
    if not args.todx:
        import threading

        ckpt = args.checkpoint
        if ckpt is None:
            from tod_tpu.train.checkpoint import pinned_checkpoint

            ckpt = pinned_checkpoint()

        def _restore():
            t0 = time.time()
            if ckpt:
                from tod_tpu.train.checkpoint import load_checkpoint

                ckpt_box["params"] = load_checkpoint(ckpt)
            ckpt_box["seconds"] = round(time.time() - t0, 2)

        loader = threading.Thread(target=_restore, daemon=True)
        loader.start()

    import jax

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    stage("import_jax")
    jax.devices()  # force the device/tunnel dial so it isn't billed to compile
    stage("device_dial")
    # first data-plane touch, as its OWN stage: the process's first
    # host→device transfer pays tunnel/session establishment beyond the
    # enumeration above, and during transport-weather stalls that first
    # touch alone has measured in the minutes — previously it hid inside
    # whatever stage happened to touch the device first (a round-5 AOT boot
    # recorded 159 s of it inside artifact_load's RTT probe warm-up)
    import numpy as _np

    _np.asarray(jax.device_put(_np.zeros((8,), _np.uint8)))
    stage("device_first_touch")

    import numpy as np

    h, w = args.height, args.width
    # a real frame, packed the way the serving loop uploads it
    from tod_tpu.core.config import CameraConfig
    from tod_tpu.runtime.frame_source import SyntheticSource

    cam = CameraConfig(width=w, height=h)
    frame = next(SyntheticSource(cam, seed=0, n_frames=1).frames())
    packed = np.empty((h * w * 5,), np.uint8)
    packed[: h * w * 3] = np.ascontiguousarray(frame.rgb, np.uint8).reshape(-1)
    packed[h * w * 3 :] = (
        np.ascontiguousarray(frame.depth, np.uint16).view(np.uint8).reshape(-1)
    )
    stage("frame_prep")

    if args.todx:
        from tod_tpu.deploy import ServingArtifact

        art = ServingArtifact.load(args.todx, probe_rtt=True)
        stage("artifact_load")
        # sub-stage attribution of the load (pickle / deserialize_and_load /
        # probe_exec, with before/after transport RTT stamps): the round-4
        # artifact couldn't say whether a slow AOT boot was program load or
        # tunnel weather (VERDICT r4 items 1b/3)
        stages["artifact_load_stages"] = art.load_stages
        path = art.plan(packed)
        stage("first_plan")
        boot = "todx-" + art.boot
    else:
        from tod_tpu.core.config import ModelConfig, PipelineConfig, PlannerConfig
        from tod_tpu.planner.api import materialize_path
        from tod_tpu.runtime.engine import Engine

        cfg = PipelineConfig(
            camera=cam,
            model=ModelConfig(input_size=(h // 8 * 8, w // 8 * 8)),
            planner=PlannerConfig(backend="tpu"),
        )
        loader.join()
        params = ckpt_box.get("params")
        stage("checkpoint_join")  # time NOT hidden behind the dial/imports
        stages["checkpoint_restore_s"] = ckpt_box.get("seconds")
        engine = Engine(cfg, params=params, mode="detect")
        stage("engine_build")
        # the plan-serving loop needs exactly one graph: the fused frame+plan
        # step.  Compile it by running the first real frame through it.
        path = materialize_path(engine._serve_step_plan(engine.params, packed))
        stage("compile_and_first_plan")
        boot = "engine-jit"
        # weather stamp: one transport RTT so a slow cold/warm boot is
        # attributable to tunnel weather vs compile (VERDICT r4 item 3)
        from tod_tpu.deploy import _rtt_probe_ms

        stages["rtt_after_ms"] = _rtt_probe_ms()

    print(
        json.dumps(
            {
                "boot_to_first_plan_s": round(time.time() - _T0, 2),
                "stages_s": stages,
                "boot": boot,
                "first_path_len": len(path.directions) if path else 0,
                "backend": jax.default_backend(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
