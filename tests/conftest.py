"""Test configuration: force CPU backend with 8 virtual devices.

The whole suite runs without a TPU (SURVEY.md §4 "Implication for the rebuild"):
JAX on the CPU backend, Pallas kernels in interpret mode, and an 8-device virtual
mesh (xla_force_host_platform_device_count) for the multi-chip sharding tests.
Must be set before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Keep any python *subprocesses* the tests spawn from dialing the TPU tunnel
# (the axon sitecustomize registers a PJRT plugin at interpreter start when
# PALLAS_AXON_POOL_IPS is set, which can stall startup for minutes when the
# tunnel is busy).  For the pytest process itself, prefer launching as
# `PALLAS_AXON_POOL_IPS= python -m pytest …` (see Makefile `test` target).
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA:CPU
# compiles of the model graphs (minutes per fresh run on this 1-core box);
# caching them across runs cuts repeat suite time several-fold.
import pathlib  # noqa: E402

_cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
