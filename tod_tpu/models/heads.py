"""YOLACT prediction heads + semantic segmentation head.

The prediction head is shared across all FPN levels (one parameter set, applied
to each Pi — the YOLACT design): a small shared tower, then three sibling convs
per spatial location × anchor: box offsets (4), class logits (C), and mask
coefficients (K, tanh — the TANH ops in the reference's compile log,
SURVEY.md §2.3).

The semantic head is a 1×1 conv on P3 producing per-pixel class logits — this is
the output the reference actually consumed (``results[4]`` as a 28×28×81 map,
src/yolact.rs:91,108); in YOLACT it is a train-time auxiliary loss, and here it
also feeds the semantic-parity postprocess path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PredictionHead(nn.Module):
    num_classes: int = 81
    num_anchors: int = 3
    num_prototypes: int = 32
    channels: int = 128
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, p):
        """p: (B, H, W, C) one pyramid level → (loc (B,HWA,4), conf (B,HWA,C),
        coeff (B,HWA,K))."""
        from tod_tpu.models.qconv import conv_factory

        def conv(f, name):
            return conv_factory(self.quantized)(
                f, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )

        x = nn.relu(conv(self.channels, "tower")(p))
        b, h, w, _ = x.shape
        a = self.num_anchors
        # Head assembly stays in the compute dtype (bf16): profiling the
        # batch-16 VGA forward showed ~1/3 of step time in pure data movement,
        # half of it f32 reshape/copy/concat of these per-anchor maps
        # (docs/performance.md).  The f32 cast happens once, after the
        # cross-level concat (models/yolact.py).  coeff is returned as RAW
        # logits — tanh is applied by consumers AFTER their top-k/positive
        # gather (≤64 anchors), not over all ~57k anchors per frame.
        loc = conv(a * 4, "loc")(x).reshape(b, h * w * a, 4)
        conf = conv(a * self.num_classes, "conf")(x).reshape(
            b, h * w * a, self.num_classes
        )
        coeff = conv(a * self.num_prototypes, "coeff")(x).reshape(
            b, h * w * a, self.num_prototypes
        )
        return loc, conf, coeff


class SemanticHead(nn.Module):
    num_classes: int = 81
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, p3):
        """(B, H/8, W/8, C) → per-pixel class logits at stride 8 — the
        28×28×81 map shape for a 224×224 input, matching src/yolact.rs:91."""
        from tod_tpu.models.qconv import conv_factory

        x = conv_factory(self.quantized)(
            self.num_classes, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="sem_out",
        )(p3)
        return x.astype(jnp.float32)
