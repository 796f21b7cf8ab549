"""YOLACT training losses (classification OHEM, box, mask, semantic).

Per the YOLACT paper: softmax cross-entropy with 3:1 online hard-negative
mining, smooth-L1 on encoded box offsets, per-instance BCE on assembled
prototype masks normalized by gt box area, and an auxiliary per-pixel semantic
segmentation loss on the P3 head — the head whose output is the reference's
only consumed tensor (src/yolact.rs:91).

Static shapes throughout: masks are supervised for up to ``max_masks`` positive
anchors chosen by match quality (fixed-size top-k), so the whole loss jits once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tod_tpu.ops.masks import assemble_masks, crop_masks

NEG_POS_RATIO = 3


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _integer_ce(logits, labels):
    """Softmax CE with integer labels as a one-hot contraction.

    ``optax.softmax_cross_entropy_with_integer_labels`` picks the label
    log-prob with a take-along-axis, which XLA:TPU lowers as a per-element
    gather fusion — these CE gathers plus the matcher's (see
    train/matcher.py) cost 1.55 ms of the 7.81 ms QVGA batch-8 train step
    (docs/performance.md, training section).  The one-hot multiply-sum is
    pure VPU work and exact: log_softmax of finite logits is finite, so
    the masked terms contribute true zeros."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(
        logp * jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype), axis=-1
    )


def classification_loss(conf, cls_target):
    """OHEM softmax CE.  conf (A, C); cls_target (A,) with −1 = ignore."""
    a, c = conf.shape
    valid = cls_target >= 0
    labels = jnp.clip(cls_target, 0, c - 1)
    ce = _integer_ce(conf, labels)
    pos = cls_target > 0
    n_pos = jnp.maximum(jnp.sum(pos), 1)

    # hard negative mining: keep the NEG_POS_RATIO·n_pos highest-loss negatives
    neg_losses = jnp.where(valid & ~pos, ce, -jnp.inf)
    sorted_neg = jnp.sort(neg_losses)[::-1]
    k = jnp.minimum(NEG_POS_RATIO * n_pos, a - 1)
    threshold = sorted_neg[k]
    neg_keep = neg_losses > threshold

    keep = pos | neg_keep
    return jnp.sum(jnp.where(keep, ce, 0.0)) / n_pos


def focal_classification_loss(conf, cls_target, alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss alternative to OHEM (RetinaNet-style) — handles the 81-way
    background imbalance without mining; usually yields better-calibrated
    confidence than OHEM on small synthetic datasets."""
    a, c = conf.shape
    valid = cls_target >= 0
    labels = jnp.clip(cls_target, 0, c - 1)
    ce = _integer_ce(conf, labels)  # one-hot contraction, not a gather
    pt = jnp.exp(-ce)
    pos = cls_target > 0
    alpha_t = jnp.where(pos, alpha, 1.0 - alpha)
    fl = alpha_t * (1.0 - pt) ** gamma * ce
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    return jnp.sum(jnp.where(valid, fl, 0.0)) / n_pos


def box_loss(loc, box_target, pos_mask):
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    per_anchor = jnp.sum(_smooth_l1(loc - box_target), axis=-1)
    return jnp.sum(jnp.where(pos_mask, per_anchor, 0.0)) / n_pos


def mask_loss(prototypes, coeff, matched_gt, pos_mask, iou_quality, gt_masks, gt_boxes, max_masks: int = 16):
    """BCE between assembled masks and gt instance masks for the top positives.

    prototypes (Hm, Wm, K); coeff (A, K); matched_gt (A,) i32; gt_masks
    (M, Hm, Wm) in {0,1}; gt_boxes (M, 4).  Loss normalized by gt box area
    (YOLACT's small-object reweighting).
    """
    hm, wm, _ = prototypes.shape
    m = gt_masks.shape[0]
    score = jnp.where(pos_mask, iou_quality, -1.0)
    _, idx = jax.lax.top_k(score, max_masks)  # anchor indices
    sel_valid = pos_mask[idx]
    sel_gt = jnp.clip(matched_gt[idx], 0, m - 1)
    # coeff arrives as raw logits (YolactOutputs contract); tanh after the
    # top-positives gather — max_masks anchors, not the full anchor map
    masks = assemble_masks(
        prototypes, jnp.tanh(coeff[idx].astype(jnp.float32))
    )  # (max_masks, Hm, Wm)
    targets = gt_masks[sel_gt]
    bce = -(
        targets * jnp.log(jnp.clip(masks, 1e-6, 1.0))
        + (1.0 - targets) * jnp.log(jnp.clip(1.0 - masks, 1e-6, 1.0))
    )
    # crop to gt box (same pixel-center convention as inference cropping) and
    # normalize by box area (YOLACT's small-object reweighting)
    boxes = gt_boxes[sel_gt]
    area = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-4
    )
    per_inst = jnp.sum(crop_masks(bce, boxes), axis=(1, 2)) / (area * hm * wm)
    n_sel = jnp.maximum(jnp.sum(sel_valid), 1)
    return jnp.sum(jnp.where(sel_valid, per_inst, 0.0)) / n_sel


def semantic_loss(sem_logits, sem_target):
    """Per-pixel softmax CE.  sem_logits (Hs, Ws, C); sem_target (Hs, Ws) i32."""
    ce = _integer_ce(sem_logits, sem_target)  # one-hot contraction (C = 81)
    return jnp.mean(ce)


def yolact_loss(
    outputs,
    anchors,
    batch,
    loss_weights=(1.0, 1.5, 6.125, 1.0),
    max_masks: int = 16,
    cls_loss: str = "ohem",
):
    """Total loss over a batch.

    outputs: YolactOutputs (batched); batch: dict with
      ``gt_boxes`` (B, M, 4), ``gt_classes`` (B, M) i32, ``gt_valid`` (B, M),
      ``gt_masks`` (B, M, Hm, Wm), ``sem_target`` (B, Hs, Ws) i32.
    Returns (total, dict of components).
    """
    from tod_tpu.train.matcher import match_anchors

    def per_example(loc, conf, coeff, protos, sem, gt_boxes, gt_classes, gt_valid, gt_masks, sem_target):
        m = match_anchors(anchors, gt_boxes, gt_classes, gt_valid)
        quality = m["best_iou"]  # match quality, computed once by the matcher
        if cls_loss == "focal":
            l_cls = focal_classification_loss(conf, m["cls_target"])
        else:
            l_cls = classification_loss(conf, m["cls_target"])
        l_box = box_loss(loc, m["box_target"], m["pos_mask"])
        l_mask = mask_loss(
            protos, coeff, m["matched_gt"], m["pos_mask"], quality,
            gt_masks, gt_boxes, max_masks,
        )
        l_sem = semantic_loss(sem, sem_target)
        return l_cls, l_box, l_mask, l_sem

    l_cls, l_box, l_mask, l_sem = jax.vmap(per_example)(
        outputs.loc,
        outputs.conf,
        outputs.coeff,
        outputs.prototypes,
        outputs.sem_logits,
        batch["gt_boxes"],
        batch["gt_classes"],
        batch["gt_valid"],
        batch["gt_masks"],
        batch["sem_target"],
    )
    w = loss_weights
    comps = {
        "cls": jnp.mean(l_cls),
        "box": jnp.mean(l_box),
        "mask": jnp.mean(l_mask),
        "sem": jnp.mean(l_sem),
    }
    total = w[0] * comps["cls"] + w[1] * comps["box"] + w[2] * comps["mask"] + w[3] * comps["sem"]
    return total, comps
