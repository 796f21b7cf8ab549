"""Diagnose the AOT boot's 43 s first dispatch (VERDICT r4 item 1c).

Stages the full AOT load path with a stopwatch on every step and a value
readback (not block_until_ready — bench.py:193-198 documents that it can ack
a dispatch before remote completion on this backend) so each stage's cost is
real.  Run on the real chip:

    python tools/diag_aot.py
"""
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import serialize_executable as se

from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig, PlannerConfig
from tod_tpu.runtime.engine import Engine
from tod_tpu.train.checkpoint import load_checkpoint, pinned_checkpoint
from tod_tpu.deploy import build_aot, export_engine, save_artifact

T = {}
def clock(name, t0):
    T[name] = round(time.time() - t0, 2)
    print(f"  {name}: {T[name]}s", flush=True)
    return time.time()

def rtt_probe():
    # transfer-only (no jit): a cold probe compile can stall minutes on the
    # remote compile service — see deploy._rtt_probe_ms
    np.asarray(jax.device_put(np.zeros((8,), np.float32)))
    t0 = time.perf_counter()
    np.asarray(jax.device_put(np.zeros((8,), np.float32)))
    return round((time.perf_counter() - t0) * 1e3, 1)

t0 = time.time()
cam = CameraConfig(width=320, height=240)
cfg = PipelineConfig(
    camera=cam, model=ModelConfig(input_size=(240, 320)),
    planner=PlannerConfig(backend="tpu"),
)
params = load_checkpoint(pinned_checkpoint())
engine = Engine(cfg, params=params, mode="detect")
t0 = clock("engine_build", t0)

exported, meta = export_engine(engine, mode="plan")
t0 = clock("export_stablehlo", t0)
blob, ameta = build_aot(engine, mode="plan")
t0 = clock("build_aot(lower+compile+serialize)", t0)
print(f"  aot blob bytes: {len(blob):,}; stablehlo bytes: {len(bytes(exported.serialize())):,}", flush=True)

todx = "/tmp/diag.todx"
save_artifact(exported, meta, todx, aot_blob=blob, aot_meta=ameta)
print(f"  todx file bytes: {os.path.getsize(todx):,}", flush=True)

print(f"rtt before load: {rtt_probe()} ms", flush=True)

# Now the load path, staged
t0 = time.time()
payload, in_tree, out_tree = pickle.loads(blob)
t0 = clock("pickle_loads", t0)
dev = jax.devices()[0]
call = se.deserialize_and_load(payload, in_tree, out_tree, execution_devices=[dev])
t0 = clock("deserialize_and_load", t0)

probe = jax.device_put(np.zeros((cam.height * cam.width * 5,), np.uint8), dev)
t0 = clock("device_put_probe", t0)

out = call(probe)
t0 = clock("first_dispatch(async)", t0)
jax.block_until_ready(out)
t0 = clock("first_block_until_ready", t0)
_ = np.asarray(out)
t0 = clock("first_value_readback", t0)

out = call(probe)
_ = np.asarray(out)
t0 = clock("second_call_with_readback", t0)

print(f"rtt after load: {rtt_probe()} ms", flush=True)
print(json.dumps(T))
