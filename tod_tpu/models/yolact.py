"""The full YOLACT graph and its jit-friendly inference wrapper.

Replaces the whole tflite/Edge-TPU inference layer (src/yolact.rs:17-41): model
loading becomes Flax module construction + params, the Edge-TPU delegate's op
placement becomes XLA:TPU compilation of the entire graph (no CPU-fallback ops —
SURVEY.md §2.2 item 1), and the unfinished postprocessing (src/yolact.rs:92-94)
becomes real detection cleanup: box decode → Fast-NMS → prototype-coefficient
mask assembly → crop/threshold.

``Yolact.__call__`` returns raw head outputs (for training); ``detect`` turns
them into fixed-shape ``Detections``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tod_tpu.core.config import ModelConfig
from tod_tpu.core.registry import register_model
from tod_tpu.core.types import Detections
from tod_tpu.models.fpn import FPN
from tod_tpu.models.heads import PredictionHead, SemanticHead
from tod_tpu.models.mobilenetv2 import MobileNetV2
from tod_tpu.models.protonet import ProtoNet
from tod_tpu.models.resnet import ResNet
from tod_tpu.ops.anchors import decode_boxes, generate_anchors
from tod_tpu.ops.masks import assemble_masks, crop_masks, masks_to_class_map
from tod_tpu.ops.nms import fast_nms


@dataclasses.dataclass
class YolactOutputs:
    """Raw head outputs for one batch.

    loc/conf are f32; ``coeff`` is RAW logits in the compute dtype (bf16) —
    consumers apply tanh after their top-k/positive-anchor gather, so the
    full-anchor-map tanh + f32 materialization never happens (it was ~2.5 ms
    of the 11.5 ms batch-16 VGA forward; docs/performance.md)."""

    loc: Any  # (B, A, 4) f32
    conf: Any  # (B, A, C) f32
    coeff: Any  # (B, A, K) compute dtype, raw logits (pre-tanh)
    prototypes: Any  # (B, H/4, W/4, K) f32
    sem_logits: Any  # (B, H/8, W/8, C) f32


jax.tree_util.register_dataclass(YolactOutputs)


class Yolact(nn.Module):
    cfg: ModelConfig

    @property
    def _qmode(self):
        """Conv quantization mode for conv_factory: False | True | "qat"."""
        cfg = self.cfg
        return "qat" if (cfg.quantized and cfg.qat) else cfg.quantized

    def _backbone(self):
        dtype = jnp.dtype(self.cfg.dtype)
        q = self._qmode
        if self.cfg.backbone == "mobilenetv2":
            return MobileNetV2(
                width_mult=self.cfg.width_mult,
                dtype=dtype,
                quantized=q,
                dw_shifted=self.cfg.depthwise_shifted,
                s2d_stem=self.cfg.s2d_stem,
            )
        if self.cfg.backbone.startswith("resnet"):
            return ResNet(variant=self.cfg.backbone, dtype=dtype, quantized=q)
        raise ValueError(f"unknown backbone {self.cfg.backbone!r}")

    @nn.compact
    def __call__(self, x, train: bool = False) -> YolactOutputs:
        """x: (B, H, W, 3) normalized images."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        q = self._qmode
        c3, c4, c5 = self._backbone()(x, train=train)
        pyramid = FPN(
            channels=cfg.fpn_channels, levels=cfg.fpn_levels, dtype=dtype, quantized=q
        )(c3, c4, c5)
        prototypes = ProtoNet(
            num_prototypes=cfg.num_prototypes, channels=cfg.proto_channels, dtype=dtype,
            quantized=q,
        )(pyramid[0])
        head = PredictionHead(
            num_classes=cfg.det_num_classes,
            num_anchors=cfg.num_anchors,
            num_prototypes=cfg.num_prototypes,
            channels=cfg.head_channels,
            dtype=dtype,
            quantized=q,
        )
        locs, confs, coeffs = [], [], []
        for p in pyramid:  # one shared head applied per level
            l, c, k = head(p)
            locs.append(l)
            confs.append(c)
            coeffs.append(k)
        sem = SemanticHead(num_classes=cfg.num_classes, dtype=dtype, quantized=q)(
            pyramid[0]
        )
        # concat in the compute dtype (the dominant data movement), one f32
        # convert at the end for loc/conf; coeff stays raw/bf16 (see
        # YolactOutputs docstring)
        return YolactOutputs(
            loc=jnp.concatenate(locs, axis=1).astype(jnp.float32),
            conf=jnp.concatenate(confs, axis=1).astype(jnp.float32),
            coeff=jnp.concatenate(coeffs, axis=1),
            prototypes=prototypes,
            sem_logits=sem,
        )


def _detect_sample(
    loc,
    conf_logits,
    coeff_all,
    protos,
    cfg: ModelConfig,
    anchors,
    out_hw: tuple[int, int],
    use_pallas: bool,
) -> Detections:
    """Per-sample detection cleanup (the vmappable core of :func:`detect`).

    loc (A, 4), conf_logits (A, C), coeff_all (A, K), protos (Hm, Wm, K).
    """
    conf = jax.nn.softmax(conf_logits, axis=-1)
    boxes_all = decode_boxes(loc, anchors)
    boxes, scores, classes, keep_idx, valid = fast_nms(
        boxes_all,
        conf,
        iou_threshold=cfg.nms_iou_threshold,
        top_k=cfg.nms_top_k,
        max_detections=cfg.max_detections,
        score_threshold=cfg.score_threshold,
    )
    # gather FIRST, tanh after: only the kept ≤N anchors need the
    # nonlinearity (coeff_all is raw logits — YolactOutputs docstring)
    coeffs = jnp.tanh(coeff_all[keep_idx].astype(jnp.float32))  # (N, K)
    if use_pallas:
        from tod_tpu.kernels.mask_assembly import assemble_crop_masks

        masks = assemble_crop_masks(protos, coeffs, boxes)
    else:
        masks = crop_masks(assemble_masks(protos, coeffs), boxes)
    masks = masks * valid[:, None, None]
    class_map, id_map = masks_to_class_map(
        masks, classes, valid, out_hw, threshold=cfg.mask_threshold
    )
    # Instance ids come directly from the detection slots (true instance
    # segmentation — each ball keeps one id from its mask).  The reference's
    # connected-components hack (src/yolact.rs:52-88) exists only because it
    # had no per-instance masks; the semantic pipeline path still reproduces
    # that behavior (ops/postprocess.py).  Ids are renumbered densely over
    # ball detections so the ball-centroid slots stay compact.
    is_ball_slot = (classes == 3) & valid  # (N,)
    ball_rank = jnp.cumsum(is_ball_slot) - 1  # dense id per ball slot
    slot_ids = jnp.where(is_ball_slot, ball_rank, -1).astype(jnp.int32)
    padded = jnp.concatenate([slot_ids, jnp.array([-1], jnp.int32)])
    # the sentinel pad covers every non-ball case: id_map<0 gathers padded[N]
    # (−1) and valid non-ball slots carry slot_ids −1 already
    ball_ids = padded[jnp.where(id_map >= 0, id_map, slot_ids.shape[0])]
    return Detections(
        boxes=boxes,
        scores=scores,
        classes=classes,
        masks=masks,
        valid=valid,
        class_map=class_map,
        id_map=ball_ids,
    )


def detect(
    outputs: YolactOutputs,
    cfg: ModelConfig,
    anchors,
    out_hw: tuple[int, int] | None = None,
    use_pallas: bool = True,
) -> Detections:
    """Head outputs → fixed-shape Detections for one image (batch element 0).

    The whole path is jnp (jit-safe, static shapes): decode → softmax → Fast-NMS
    → mask assembly (+crop/threshold) → per-pixel class/id maps.  The mask
    GEMM+crop+threshold runs as a fused Pallas kernel when ``use_pallas``.
    """
    out_hw = out_hw or cfg.input_size
    return _detect_sample(
        outputs.loc[0],
        outputs.conf[0],
        outputs.coeff[0],
        outputs.prototypes[0],
        cfg,
        anchors,
        out_hw,
        use_pallas,
    )


def detect_batch(
    outputs: YolactOutputs,
    cfg: ModelConfig,
    anchors,
    out_hw: tuple[int, int] | None = None,
) -> Detections:
    """Batched detection cleanup: vmap of the per-sample core — every field of
    the returned Detections gains a leading batch axis.  The DP serving path
    (parallel/serving.py) runs this on dp-sharded batches; the per-sample jnp
    path is used (the Pallas mask kernel does not lower under vmap)."""
    out_hw = out_hw or cfg.input_size

    def _one(loc, conf, coeff, protos):
        return _detect_sample(loc, conf, coeff, protos, cfg, anchors, out_hw, False)

    return jax.vmap(_one)(
        outputs.loc, outputs.conf, outputs.coeff, outputs.prototypes
    )


@register_model("yolact_mnv2_fpn")
def _yolact_mnv2(cfg: ModelConfig | None = None) -> Yolact:
    """Default family entry point.  ``cfg.backbone`` is AUTHORITATIVE: this
    factory used to force mobilenetv2, which silently retargeted every
    ``ModelConfig(backbone="resnetXX")`` built under the default name —
    ``train.run --backbone resnet50`` trained MobileNetV2 bit-for-bit, and
    round 4's config-15 "R18/R50" quality cells actually scored MNv2
    checkpoints (caught in round 5 when two different-backbone training
    curves matched to 4 decimals).  The explicit family names below still
    pin their backbone."""
    cfg = cfg or ModelConfig()
    return Yolact(cfg=cfg)


@register_model("yolact_r18_fpn")
def _yolact_r18(cfg: ModelConfig | None = None) -> Yolact:
    cfg = cfg or ModelConfig(backbone="resnet18")
    return Yolact(cfg=dataclasses.replace(cfg, backbone="resnet18"))


@register_model("yolact_r50_fpn")
def _yolact_r50(cfg: ModelConfig | None = None) -> Yolact:
    cfg = cfg or ModelConfig(backbone="resnet50")
    return Yolact(cfg=dataclasses.replace(cfg, backbone="resnet50"))


def create_model(cfg: ModelConfig | None = None):
    """Build (model, anchors) for a config."""
    cfg = cfg or ModelConfig()
    from tod_tpu.core.registry import get_model

    model = get_model(cfg.name, cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    return model, anchors
