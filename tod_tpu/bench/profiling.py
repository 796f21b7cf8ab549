"""Device-timeline profiling: capture a jax.profiler trace and break a step
into its top XLA ops / op categories.

This is the tool behind docs/performance.md's batch-16 VGA breakdown (the
round-3 data-movement findings).  The xplane proto parser uses the protobuf
stubs TensorFlow ships (imported lazily — the serving path never pays for TF).

CLI::

    python -m tod_tpu.bench.profiling            # batch-16 VGA flagship fwd
    python -m tod_tpu.bench.profiling --qvga-serve  # the QVGA serve step
"""

from __future__ import annotations

import collections
import glob
import os
import re
import tempfile


def capture_trace(fn, *args, iters: int = 4, logdir: str | None = None) -> str:
    """Run ``fn(*args)`` ``iters`` times under jax.profiler; returns the
    xplane.pb path.  ``fn`` should be jitted and already warmed (compile
    excluded from the trace)."""
    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="tod-trace-")
    out = fn(*args)
    jax.block_until_ready(out)  # warm
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb produced under {logdir}")
    return files[0]


def _category(op_name: str) -> str:
    # NOTE: match the full word "convolution" — a bare "conv" substring
    # false-positives on "convert" fusions (a real mislabeling caught by
    # tests/test_bench.py)
    if "convolution" in op_name:
        return "convolution"
    m = re.match(r"%([a-zA-Z\-_]+)", op_name)
    return m.group(1).rstrip(".0123456789") if m else "?"


def top_ops(xplane_path: str, iters: int = 4, device_plane: str = "TPU"):
    """Aggregate the device plane's synchronous op timeline.

    Returns (total_ms_per_step, by_category, top_ops) where by_category and
    top_ops are lists of (name, ms_per_step[, count]).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    # aggregate over ALL matching planes: the first device-named plane can
    # be a non-op plane (or an idle secondary device) with no "XLA Ops"
    # line — returning from it would report 0.0 ms as if the step were free
    tot: collections.Counter = collections.Counter()
    cat: collections.Counter = collections.Counter()
    n: collections.Counter = collections.Counter()
    matched = False
    for plane in xs.planes:
        if device_plane not in plane.name:
            continue
        matched = True
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                n[name] += 1
                cat[_category(name)] += ev.duration_ps
    if not matched:
        raise RuntimeError(f"no plane matching {device_plane!r} in {xplane_path}")
    if not tot:
        raise RuntimeError(
            f"planes matching {device_plane!r} carry no 'XLA Ops' line in "
            f"{xplane_path} — wrong plane name or an empty capture"
        )
    total_ms = sum(tot.values()) / 1e9 / iters
    by_cat = [(c, ps / 1e9 / iters) for c, ps in cat.most_common()]
    top = [
        (name, ps / 1e9 / iters, n[name] // iters)
        for name, ps in tot.most_common(20)
    ]
    return total_ms, by_cat, top


def profile_flagship_forward(batch: int = 16, hw=(480, 640)) -> None:
    """Trace + print the batch-N VGA flagship forward breakdown."""
    import jax
    import jax.numpy as jnp

    from tod_tpu.core.config import ModelConfig
    from tod_tpu.models.yolact import create_model

    mcfg = ModelConfig(input_size=hw)
    model, _ = create_model(mcfg)
    x0 = jnp.zeros((batch, *hw, 3), jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False).loc)
    _print_report(capture_trace(fwd, variables, x0), f"batch-{batch} {hw} forward")


def profile_qvga_serve(plan: bool = False) -> None:
    """Trace + print the QVGA batch-1 serve step breakdown.

    ``plan=True`` traces the fused frame+plan graph (`Engine._serve_step_plan`
    — the device-planner serving dispatch) instead of the packed frame step,
    so the Bellman-Ford/path-walk cost shows up in the same breakdown."""
    import jax
    import numpy as np

    from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig
    from tod_tpu.runtime import Engine

    cam = CameraConfig(width=320, height=240)
    cfg = PipelineConfig(camera=cam, model=ModelConfig(input_size=(240, 320)))
    eng = Engine(cfg, mode="detect")
    eng.warmup()
    packed = jax.device_put(np.zeros((cam.height * cam.width * 5,), np.uint8))
    if plan:
        step, title = eng._serve_step_plan, "QVGA fused frame+plan step"
    else:
        step, title = jax.jit(eng._serve_step_packed_fn), "QVGA serve step"
    _print_report(capture_trace(lambda p: step(eng.params, p), packed), title)


def profile_train_step(batch: int = 8, hw=(240, 320), iters: int = 4) -> None:
    """Trace + print the flagship train-step breakdown (fwd + loss + bwd +
    optimizer, the config-11 shape).  The step donates its TrainState, so
    the trace loop must CARRY the state instead of re-calling on stale args
    (capture_trace's fixed-args replay would pass an already-donated
    buffer)."""
    import jax
    import jax.numpy as jnp

    from tod_tpu.core.config import ModelConfig, TrainConfig
    from tod_tpu.train import SyntheticDetectionData, Trainer

    tcfg = TrainConfig(batch_size=batch, warmup_steps=2, total_steps=100)
    trainer = Trainer(ModelConfig(input_size=hw), tcfg)
    data = SyntheticDetectionData(hw, batch_size=batch, seed=0)
    b = {k: jnp.asarray(v) for k, v in data.next_batch().items()}
    trainer.state, m = trainer._step(trainer.state, b)  # warm/compile
    jax.block_until_ready(m["loss"])
    logdir = tempfile.mkdtemp(prefix="tod-trace-")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            trainer.state, m = trainer._step(trainer.state, b)
        jax.block_until_ready(m["loss"])
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb produced under {logdir}")
    _print_report(files[0], f"batch-{batch} {hw} train step", iters=iters)


def _print_report(path: str, title: str, iters: int = 4) -> None:
    total, by_cat, top = top_ops(path, iters=iters)
    print(f"== {title}: {total:.3f} ms/step (device op time) ==")
    print("-- by category --")
    for c, ms in by_cat[:12]:
        print(f"  {ms:8.3f} ms  {c}")
    print("-- top ops --")
    for name, ms, cnt in top:
        print(f"  {ms:8.3f} ms x{cnt:3d}  {name[:110]}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--qvga-serve", action="store_true")
    ap.add_argument("--plan", action="store_true", help="fused frame+plan graph")
    ap.add_argument("--train", action="store_true", help="QVGA batch-N train step")
    ap.add_argument("--batch", type=int, default=16)
    a = ap.parse_args()
    if a.train:
        profile_train_step(batch=a.batch if a.batch != 16 else 8)
    elif a.qvga_serve or a.plan:
        profile_qvga_serve(plan=a.plan)
    else:
        profile_flagship_forward(batch=a.batch)
