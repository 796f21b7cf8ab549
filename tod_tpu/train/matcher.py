"""Anchor ↔ ground-truth matching (SSD/YOLACT scheme).

The reference is inference-only (frozen tflite weights, src/yolact.rs:18-20);
the rebuild owns training, so the full target-assignment machinery lives here:
per anchor, the best-overlapping gt box; positives above the high threshold,
negatives below the low one, an ignore band between; and each gt force-matched
to its best anchor so no object goes unsupervised.

Everything is static-shape: gt boxes arrive padded to M slots with class 0
(= background padding), masked by ``gt_valid``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tod_tpu.ops.anchors import box_iou, encode_boxes

POS_IOU = 0.5
NEG_IOU = 0.4


def match_anchors(anchors, gt_boxes, gt_classes, gt_valid):
    """anchors (A, 4) cycxhw; gt_boxes (M, 4) y1x1y2x2; gt_classes (M,) i32;
    gt_valid (M,) bool.

    → dict with
      ``cls_target``  (A,) i32 — 0 background, ≥1 class id, −1 ignore band
      ``box_target``  (A, 4) f32 — encoded offsets (valid where matched > 0)
      ``matched_gt``  (A,) i32 — index of the matched gt (−1 if none)
      ``pos_mask``    (A,) bool
      ``best_iou``    (A,) f32 — each anchor's best gt overlap (match quality)
    """
    a = anchors.shape[0]
    # anchors to corner form for IoU
    corners = jnp.stack(
        [
            anchors[:, 0] - anchors[:, 2] / 2,
            anchors[:, 1] - anchors[:, 3] / 2,
            anchors[:, 0] + anchors[:, 2] / 2,
            anchors[:, 1] + anchors[:, 3] / 2,
        ],
        axis=-1,
    )
    iou = box_iou(corners, gt_boxes)  # (A, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)  # (A,)
    best_iou = jnp.max(iou, axis=1)

    # force-match: every valid gt claims its best anchor
    best_anchor = jnp.argmax(iou, axis=0)  # (M,)
    forced = jnp.zeros((a,), bool)
    forced_gt = jnp.full((a,), -1, jnp.int32)
    m = gt_boxes.shape[0]
    for j in range(m):  # m is small & static — unrolled
        take = gt_valid[j]
        idx = best_anchor[j]
        forced = forced.at[idx].set(jnp.where(take, True, forced[idx]))
        forced_gt = forced_gt.at[idx].set(jnp.where(take, j, forced_gt[idx]))

    pos = (best_iou >= POS_IOU) | forced
    neg = (best_iou < NEG_IOU) & ~forced
    matched_gt = jnp.where(forced, forced_gt, best_gt.astype(jnp.int32))
    matched_gt = jnp.where(pos, matched_gt, -1)

    # Per-anchor gt selection as a one-hot contraction, not an integer
    # gather: XLA:TPU lowers (A,)-indexed gathers as serialized scalar-ish
    # fusions (this + the loss gathers cost 1.55 ms of the 7.81 ms QVGA
    # batch-8 train step — docs/performance.md, training section); a
    # (A, M) 0/1 matmul with M = 6 slots is vector work and EXACT
    # (selector rows sum one finite value and zeros; class ids are small
    # ints, exact in f32).
    sel = jax.nn.one_hot(jnp.clip(matched_gt, 0, m - 1), m, dtype=jnp.float32)
    cls_from_gt = (sel @ gt_classes.astype(jnp.float32)).astype(jnp.int32)
    cls_target = jnp.where(pos, cls_from_gt, jnp.where(neg, 0, -1)).astype(jnp.int32)

    gt_for_anchor = sel @ gt_boxes  # (A, 4)
    box_target = encode_boxes(gt_for_anchor, anchors)
    return {
        "cls_target": cls_target,
        "box_target": box_target,
        "matched_gt": matched_gt,
        "pos_mask": pos,
        "best_iou": best_iou,
    }
