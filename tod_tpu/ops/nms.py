"""Fast-NMS (YOLACT's parallel non-max suppression).

Part of the YOLACT detection cleanup the reference never implemented
(src/yolact.rs:92-94); built here per the YOLACT paper's Fast-NMS: instead of the
sequential greedy loop, compute the full pairwise IoU matrix of the top-k boxes
per class, zero its lower triangle, and drop any box whose max-IoU against a
higher-scored box exceeds the threshold.  Everything is fixed-shape matrix work —
exactly what the MXU/VPU want — and it admits matches the greedy result except for
rare chain-suppression cases (the paper's accepted ~0.1 mAP tradeoff).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tod_tpu.ops.anchors import box_iou


def fast_nms(
    boxes,
    scores,
    iou_threshold: float = 0.5,
    top_k: int = 64,
    max_detections: int = 32,
    score_threshold: float = 0.05,
):
    """Class-wise Fast-NMS with static output shapes.

    boxes:  (A, 4) y1x1y2x2 normalized
    scores: (A, C) per-class confidences, class 0 = background (dropped)
    →  (boxes (N,4), scores (N,), classes (N,) int32, keep_idx (N,) int32,
        valid (N,) bool) with N = max_detections; classes are 1-based (bg = 0
        never emitted), matching the reference's class code space
        (src/yolact.rs:98-101).
    """
    num_classes = scores.shape[1]
    fg_scores = scores[:, 1:]  # (A, C-1)

    def per_class(cls_scores):
        s, idx = jax.lax.top_k(cls_scores, top_k)  # (k,)
        b = boxes[idx]  # (k, 4)
        iou = box_iou(b, b)
        # upper triangle: iou[i, j] for i < j = overlap of box j with a
        # higher-scored box i
        iou = jnp.triu(iou, k=1)
        max_iou = jnp.max(iou, axis=0)  # (k,)
        keep = (max_iou <= iou_threshold) & (s > score_threshold)
        return b, jnp.where(keep, s, 0.0), idx

    b_all, s_all, i_all = jax.vmap(per_class, in_axes=1)(fg_scores)
    # b_all: (C-1, k, 4); flatten classes × candidates
    cls_ids = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[:, None], s_all.shape
    )
    flat_scores = s_all.reshape(-1)
    flat_boxes = b_all.reshape(-1, 4)
    flat_cls = cls_ids.reshape(-1)
    flat_idx = i_all.reshape(-1)

    top_scores, order = jax.lax.top_k(flat_scores, max_detections)
    out_boxes = flat_boxes[order]
    out_cls = flat_cls[order]
    out_idx = flat_idx[order]
    valid = top_scores > score_threshold
    return out_boxes, top_scores, out_cls, out_idx, valid


def greedy_nms_reference(boxes, scores, iou_threshold):
    """Sequential greedy NMS oracle (NumPy), for testing Fast-NMS against.

    boxes (A,4), scores (A,) for ONE class, already thresholded; returns the kept
    indices in descending-score order.
    """
    import numpy as np

    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-scores)
    kept = []
    while order.size:
        i = order[0]
        kept.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        y1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        x1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        y2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        x2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-12)
        order = rest[iou <= iou_threshold]
    return kept
