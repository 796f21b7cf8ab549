"""Prototype-coefficient mask assembly (pure-jnp reference implementation).

The reference skipped this ("Prototype mask: Don't have time to figure out the
IOU mask algorithm", src/yolact.rs:5); per SURVEY.md §2.3 / BASELINE.json we build
the real YOLACT mask path: masks = sigmoid(prototypes @ coefficients), cropped to
each detection's box, thresholded.

This module is the jnp oracle; the fused Pallas kernel (GEMM + crop + threshold in
one VMEM pass) lives in ``tod_tpu.kernels.mask_assembly`` and is validated against
this implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_masks(prototypes, coeffs):
    """prototypes (Hm, Wm, K) × coeffs (N, K) → (N, Hm, Wm) sigmoid masks.

    The contraction is a single (Hm·Wm, K) @ (K, N) GEMM — MXU work.
    """
    hm, wm, k = prototypes.shape
    p = prototypes.reshape(hm * wm, k)
    m = jnp.dot(p, coeffs.T, preferred_element_type=jnp.float32)  # (Hm*Wm, N)
    return jax.nn.sigmoid(m).T.reshape(coeffs.shape[0], hm, wm)


def crop_masks(masks, boxes):
    """Zero mask values outside each detection's box.

    masks (N, Hm, Wm), boxes (N, 4) y1x1y2x2 normalized → (N, Hm, Wm).
    """
    n, hm, wm = masks.shape
    ys = (jnp.arange(hm, dtype=jnp.float32) + 0.5) / hm  # pixel centers
    xs = (jnp.arange(wm, dtype=jnp.float32) + 0.5) / wm
    yy = ys[None, :, None]
    xx = xs[None, None, :]
    inside = (
        (yy >= boxes[:, 0, None, None])
        & (yy <= boxes[:, 2, None, None])
        & (xx >= boxes[:, 1, None, None])
        & (xx <= boxes[:, 3, None, None])
    )
    return jnp.where(inside, masks, 0.0)


def threshold_masks(masks, threshold: float = 0.5):
    return (masks > threshold).astype(jnp.uint8)


def masks_to_class_map(masks, classes, valid, out_hw: tuple[int, int], threshold=0.5):
    """Collapse instance masks into a per-pixel class map + instance id map —
    the reference's observable output format (src/yolact.rs:127-128), produced
    here from *real* instance masks rather than a semantic argmax.

    masks (N, Hm, Wm) in [0,1]; classes (N,) int32; valid (N,) bool.
    Higher-scored instances (lower slot index) win overlaps.
    Returns (class_map uint8 (H, W), id_map int32 (H, W), -1 where none).
    """
    n = masks.shape[0]
    masks_up = jax.image.resize(masks, (n, *out_hw), method="linear")
    on = (masks_up > threshold) & valid[:, None, None]
    # first (highest-score) instance covering each pixel
    first = jnp.argmax(on, axis=0)  # (H, W); 0 if none on
    any_on = jnp.any(on, axis=0)
    class_map = jnp.where(any_on, classes[first], 0).astype(jnp.uint8)
    id_map = jnp.where(any_on, first, -1).astype(jnp.int32)
    return class_map, id_map
