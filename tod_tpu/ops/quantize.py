"""Int8 weight quantization (PTQ) + the Pallas quantization kernel.

The reference's model is u8-quantized end to end (dequant at
src/yolact.rs:172-177; 8.05 MiB tflite blob).  The rebuild runs bf16/f32 on the
MXU by default — faster on TPU than int8 would need to be — but ships two
quantization paths: the full int8 *inference* graph (weights AND activations,
s32 MXU accumulation — ``ModelConfig.quantized`` / models/qconv.py), and this
post-training weight-only quantization for checkpoint-size parity
(SURVEY.md §7 "Quantization tolerance"):

- per-channel symmetric int8 for conv/dense kernels (last axis = output
  channels), scales in f32;
- dequantized on the fly at apply time (weight-only quantization: memory wins,
  numerics within ~0.4% per weight);
- the quantizer itself is a Pallas kernel using the TPU's native PRNG for
  stochastic rounding (guide pattern), with a deterministic jnp fallback used
  off-TPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _quant_kernel(x_ref, seed_ref, vals_ref, scale_ref):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    x = x_ref[:]
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)  # per output channel
    scale = jnp.maximum(amax / 127.0, 1e-12)
    scaled = x / scale
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    vals_ref[:] = pltpu.stochastic_round(scaled, bits, target_dtype=jnp.int8)
    scale_ref[:] = scale


def quantize_tensor_pallas(x2d, seed: int = 0, interpret: bool | None = None):
    """(N, C) f32 → (int8 values (N, C), scales (1, C)) via the Pallas
    stochastic-rounding kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, c = x2d.shape
    return pl.pallas_call(
        _quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, c), jnp.int8),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x2d.astype(jnp.float32), jnp.array([seed], jnp.int32))


def quantize_tensor(x2d, stochastic: bool = False, seed: int = 0):
    """Deterministic (round-to-nearest) or stochastic per-channel int8 quant."""
    if stochastic:
        return quantize_tensor_pallas(x2d, seed)
    amax = jnp.max(jnp.abs(x2d), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x2d / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _is_kernel(path, leaf) -> bool:
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return name == "kernel" and getattr(leaf, "ndim", 0) >= 2


def quantize_params(variables: Any, stochastic: bool = False, seed: int = 0):
    """Quantize every conv/dense kernel in a variables pytree.

    Returns a pytree of the same structure where each kernel leaf becomes a
    dict ``{"q": int8, "scale": f32, "shape": orig_shape}``; other leaves
    (biases, norms, batch_stats) pass through in f32.
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    out_leaves = []
    for i, (path, leaf) in enumerate(flat):
        if _is_kernel(path, leaf):
            shape = leaf.shape
            x2d = leaf.reshape(-1, shape[-1])
            q, scale = quantize_tensor(x2d, stochastic=stochastic, seed=seed + i)
            out_leaves.append({"q": q, "scale": scale, "shape": tuple(shape)})
        else:
            out_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def dequantize_params(qvariables: Any, dtype=jnp.float32):
    """Inverse of :func:`quantize_params` (kernels reconstructed in ``dtype``)."""

    def deq(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"q", "scale", "shape"}:
            w = leaf["q"].astype(jnp.float32) * leaf["scale"]
            return w.reshape(leaf["shape"]).astype(dtype)
        return leaf

    return jax.tree.map(deq, qvariables, is_leaf=lambda x: isinstance(x, dict) and set(x) == {"q", "scale", "shape"})


def quantized_size_bytes(qvariables: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(qvariables):
        total += np.asarray(leaf).nbytes
    return total
