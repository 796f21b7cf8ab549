"""Anchor generation and box coding for the YOLACT prediction heads.

The reference never finished its detection heads (src/yolact.rs:92-94: "Not enough
time … essentially semantic segmentation"); per SURVEY.md §2.3 we implement the
real YOLACT anchor machinery: one anchor set per FPN level (P3..P7), 3 aspect
ratios per location, SSD-style box coding with variances (0.1, 0.2).

All shapes are static functions of the input size, so anchor tensors are baked
into the jit'd graph as constants.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from tod_tpu.core.config import ModelConfig

BOX_VARIANCES = (0.1, 0.2)


def feature_shapes(input_hw: tuple[int, int], strides) -> list[tuple[int, int]]:
    """SAME-padded conv pyramid shapes for each stride."""
    return [(math.ceil(input_hw[0] / s), math.ceil(input_hw[1] / s)) for s in strides]


def generate_anchors(cfg: ModelConfig) -> np.ndarray:
    """→ (A, 4) float32 anchors as (cy, cx, h, w), normalized to [0, 1].

    Level i uses scale ``cfg.anchor_scales[i]`` (pixels) times each sub-octave
    multiplier in ``cfg.anchor_scale_mults`` and all aspect ratios; following
    YOLACT, ratio r at effective scale s gives w = s·√r, h = s/√r.

    Ordering is position-major with the anchor axis (mult-major, ratio-minor)
    innermost — anchor index ``(y*fw + x)*A + m*R + j`` — matching
    PredictionHead's (B, H, W, A·4) → (B, H·W·A, 4) reshape, so loc/conf/coeff
    index i always pairs with the anchor at the same spatial cell.
    """
    ih, iw = cfg.input_size
    out = []
    for (fh, fw), scale in zip(feature_shapes(cfg.input_size, cfg.strides), cfg.anchor_scales):
        ys = (np.arange(fh) + 0.5) / fh
        xs = (np.arange(fw) + 0.5) / fw
        cy, cx = np.meshgrid(ys, xs, indexing="ij")  # (fh, fw)
        per_anchor = []
        for mult in cfg.anchor_scale_mults:
            s = scale * mult
            for r in cfg.anchor_aspect_ratios:
                w = s * math.sqrt(r) / iw
                h = s / math.sqrt(r) / ih
                per_anchor.append(
                    np.stack([cy, cx, np.full_like(cy, h), np.full_like(cx, w)], axis=-1)
                )  # (fh, fw, 4)
        lvl = np.stack(per_anchor, axis=2)  # (fh, fw, A, 4), anchor innermost
        out.append(lvl.reshape(-1, 4))
    return np.concatenate(out, axis=0).astype(np.float32)


def decode_boxes(loc, anchors):
    """SSD decode: predicted offsets (A, 4) + anchors (A, 4) cycxhw → boxes
    (A, 4) as (y1, x1, y2, x2) normalized."""
    vc, vs = BOX_VARIANCES
    cy = anchors[:, 0] + loc[:, 0] * vc * anchors[:, 2]
    cx = anchors[:, 1] + loc[:, 1] * vc * anchors[:, 3]
    h = anchors[:, 2] * jnp.exp(loc[:, 2] * vs)
    w = anchors[:, 3] * jnp.exp(loc[:, 3] * vs)
    return jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)


def encode_boxes(boxes, anchors):
    """Inverse of :func:`decode_boxes`: gt boxes (A, 4) y1x1y2x2 → loc targets."""
    vc, vs = BOX_VARIANCES
    gh = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-8)
    gw = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-8)
    gcy = (boxes[:, 0] + boxes[:, 2]) / 2
    gcx = (boxes[:, 1] + boxes[:, 3]) / 2
    ty = (gcy - anchors[:, 0]) / (vc * anchors[:, 2])
    tx = (gcx - anchors[:, 1]) / (vc * anchors[:, 3])
    th = jnp.log(gh / anchors[:, 2]) / vs
    tw = jnp.log(gw / anchors[:, 3]) / vs
    return jnp.stack([ty, tx, th, tw], axis=-1)


def box_iou(a, b):
    """Pairwise IoU of (N, 4) × (M, 4) y1x1y2x2 boxes → (N, M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    y1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)
