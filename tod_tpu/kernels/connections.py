"""Connection-weights Pallas kernel: world positions + 8-neighbor distances.

TPU replacement for shaders/pt_cloud_weights.comp.  The shader needed a
3-stage barrier-separated exchange because GLSL invocations can't read their
neighbors' registers (design doc shaders/parallel_connections_algorithm.md);
with the padded height map resident in VMEM each of the 8 distance planes is a
shifted subtract computed in one pass:

    conn[i][p] = sqrt(dx² + dy² + (height[p] − height[p + off_i])²),  −1 off-grid

The kernel emits the 8 planes as a (8, H, W) stack (full-lane tiles per plane);
the wrapper moves the axis to the consumer's (H, W, 8) layout.  ``pos`` is a
broadcast iota + copy — free under XLA, kept outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tod_tpu.core.types import NEIGHBOR_OFFSETS

def _kernel(hpad_ref, out_ref, *, h: int, w: int):
    center = hpad_ref[pl.ds(1, h), pl.ds(1, w)]
    for i, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
        nh = hpad_ref[pl.ds(1 + dy, h), pl.ds(1 + dx, w)]
        d = jnp.sqrt(float(dx * dx + dy * dy) + (center - nh) ** 2)
        # off-grid neighbors were padded with NaN → propagate as −1
        out_ref[i] = jnp.where(jnp.isnan(nh), -1.0, d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def connection_weights(height_map, interpret: bool | None = None):
    """(H, W) height map → (pos (H, W, 3) f32, connections (H, W, 8) f32).

    Matches tod_tpu.geometry.fusion.connection_weights (the jnp oracle).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = height_map.shape
    hm = height_map.astype(jnp.float32)
    hpad = jnp.pad(hm, 1, constant_values=jnp.nan)
    planes = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((8, h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hpad)
    conns = jnp.moveaxis(planes, 0, -1)
    xx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    yy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    pos = jnp.stack([xx, hm, yy], axis=-1)
    return pos, conns
