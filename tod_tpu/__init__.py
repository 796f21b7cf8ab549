"""tod_tpu — a TPU-native (JAX / XLA / Pallas) rebuild of the capabilities of
``icf3ver/tiny-object-detection``.

The reference (surveyed in ``SURVEY.md``) is an Edge-TPU / Raspberry-Pi robot-vision
stack: RGB-D camera ingest, YOLACT-style instance segmentation on a Coral ASIC,
Vulkan compute-shader depth fusion into a birdseye occupancy/cost map, a
multi-source Dijkstra planner, and a small TCP protocol serving
``(magnitude, rotation)`` driving directions.

This package re-designs every layer TPU-first:

- ``core``      typed config, data types, model registry
                (replaces the reference's hard-coded constants, SURVEY.md §5 "Config")
- ``ops``       fused preprocessing, postprocessing, NMS, anchors, connected
                components (replaces src/yolact.rs pre/postprocessing)
- ``models``    MobileNetV2 / ResNet backbones, FPN, protonet, prediction heads —
                the from-scratch YOLACT graph compiled by XLA (replaces the tflite
                FlatBuffer + Edge-TPU delegate, src/yolact.rs:17-41)
- ``kernels``   Pallas TPU kernels for the hot paths: mask assembly
                (GEMM+crop+threshold), occupancy bump dilation, connection weights
                (replaces shaders/pt_cloud.comp, pt_cloud_weights.comp)
- ``geometry``  depth→point-cloud→occupancy fusion (replaces src/scene.rs:147-331)
- ``planner``   multi-source shortest-path search: C++/NumPy Dijkstra + on-TPU
                Bellman-Ford relaxation (replaces src/path.rs:25-120)
- ``serve``     asyncio TCP server, byte-compatible NewPath/GetPath wire protocol
                (replaces src/path.rs:132-180)
- ``runtime``   frame sources, double-buffered streaming engine, scene store
                (replaces the tokio orchestration in src/main.rs + src/scene.rs)
- ``parallel``  jax.sharding Mesh helpers, DP/TP sharded train/infer steps
- ``train``     losses, target assignment, synthetic data, optax trainer, orbax
                checkpointing (the reference shipped frozen weights; we train)
- ``native``    C++ runtime pieces (frame ring buffer, planner core) via ctypes
- ``bench``     runnable benchmarks for every BASELINE config + device-timeline
                profiling
- ``sim``       closed-loop drive-to-ball simulation: metric world, fusion-
                consistent renderer, signed-turn direction follower (the
                robot-controller consumer the reference never shipped)
- ``deploy``    frozen serving artifacts: the fused graph exported to a single
                StableHLO ``.todx`` file, served without model code (the
                tflite-blob deployment story, src/yolact.rs:18-20)
"""

__version__ = "0.1.0"

from tod_tpu.core.config import PipelineConfig, ModelConfig, GeometryConfig  # noqa: F401

# Headline API, imported lazily: ``tod_tpu.Engine`` / ``PathClient`` /
# ``PathStore`` resolve on first use without making ``import tod_tpu`` pull
# the full jax/flax stack (interpreter startup matters on serving hosts).
_LAZY = {
    "Engine": ("tod_tpu.runtime.engine", "Engine"),
    "PathClient": ("tod_tpu.serve.client", "PathClient"),
    "PathStore": ("tod_tpu.serve.server", "PathStore"),
    "Path": ("tod_tpu.core.types", "Path"),
    "Frame": ("tod_tpu.core.types", "Frame"),
    "Scene": ("tod_tpu.core.types", "Scene"),
    "Detections": ("tod_tpu.core.types", "Detections"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value  # cache for subsequent lookups
        return value
    raise AttributeError(f"module 'tod_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
