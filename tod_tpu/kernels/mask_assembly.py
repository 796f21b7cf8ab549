"""Fused prototype-coefficient mask assembly Pallas kernel.

BASELINE.json north star: "Fast-NMS and prototype-coefficient mask assembly
(GEMM + crop + threshold) fused into Pallas kernels".  One kernel pass computes

    masks[n, h, w] = sigmoid( Σ_k coeff[n, k] · proto[h, w, k] ) · inside_box[n, h, w]

keeping the (Hm·Wm, K) prototype block resident in VMEM for the whole GEMM and
fusing the sigmoid + box-crop epilogue so the (N, Hm, Wm) mask tensor is written
to HBM exactly once (the jnp reference in ops.masks materializes the GEMM result,
the sigmoid, and the crop mask separately).

The contraction itself is MXU work: (N, K) × (K, Hm·Wm).  At the flagship sizes
(K=32, N=32, Hm·Wm=5120 for a 256×320 input) the whole problem fits in VMEM, so
the kernel runs as a single program; larger maps tile over the spatial axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(protos_ref, coeffs_ref, boxes_ref, out_ref, *, hm: int, wm: int):
    protos = protos_ref[:]  # (Hm*Wm, K)
    coeffs = coeffs_ref[:]  # (N, K)
    n = coeffs.shape[0]
    hw = hm * wm
    # (N, K) · (Hm*Wm, K)^T → (N, Hm*Wm), contracting K without a transpose copy
    logits = jax.lax.dot_general(
        coeffs,
        protos,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    masks = jax.nn.sigmoid(logits)  # (N, Hm*Wm)
    # crop epilogue in FLAT layout: reshaping (N, Hm·Wm)→(N, Hm, Wm) inside the
    # kernel splits the lane dimension, which the Mosaic compiler rejects; the
    # wrapper reshapes after.  Pixel coords come from div/mod on a flat iota
    # (integer iota only — tpu.iota has no float variant), bounds from
    # lax.slice (fancy indexing would lower to an unsupported gather).
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, hw), 1)
    ys = ((idx // wm).astype(jnp.float32) + 0.5) / hm
    xs = ((idx % wm).astype(jnp.float32) + 0.5) / wm
    boxes = boxes_ref[:]  # (N, 4) y1x1y2x2

    def bound(j):
        return jax.lax.slice(boxes, (0, j), (n, j + 1))  # (N, 1), broadcasts

    inside = (
        (ys >= bound(0)) & (ys <= bound(2)) & (xs >= bound(1)) & (xs <= bound(3))
    )
    out_ref[:] = jnp.where(inside, masks, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def assemble_crop_masks(prototypes, coeffs, boxes, interpret: bool | None = None):
    """prototypes (Hm, Wm, K), coeffs (N, K), boxes (N, 4) → (N, Hm, Wm) f32.

    Pallas-fused equivalent of ``crop_masks(assemble_masks(p, c), b)``.
    ``interpret`` defaults to True off-TPU so the CPU test suite exercises the
    same kernel source (SURVEY.md §4: interpret=True Pallas on CPU backend).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hm, wm, k = prototypes.shape
    n = coeffs.shape[0]
    protos2d = prototypes.reshape(hm * wm, k).astype(jnp.float32)
    kernel = functools.partial(_kernel, hm=hm, wm=wm)
    flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hm * wm), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(protos2d, coeffs.astype(jnp.float32), boxes.astype(jnp.float32))
    return flat.reshape(n, hm, wm)
