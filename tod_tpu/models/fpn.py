"""Feature Pyramid Network (P3..P7), YOLACT-style.

The reference's compiled graph contains the FPN's RESIZE_BILINEAR×3 upsamples and
CONCATENATION ops (data/FRC_model_edgetpu.log op inventory, SURVEY.md §2.3).
Standard design: 1×1 laterals on C3/C4/C5, top-down bilinear upsample + add,
3×3 smoothing convs, then P6/P7 via stride-2 3×3 convs (as in YOLACT/RetinaNet).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    channels: int = 128
    levels: int = 5  # P3..P(3+levels-1)
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, c3, c4, c5):
        from tod_tpu.models.qconv import conv_factory

        def conv(k, s=1, name=None):
            return conv_factory(self.quantized)(
                self.channels, (k, k), strides=s, padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        p5 = conv(1, name="lat5")(c5)
        p4 = conv(1, name="lat4")(c4) + _upsample_to(p5, c4.shape)
        p3 = conv(1, name="lat3")(c3) + _upsample_to(p4, c3.shape)

        p3 = nn.relu(conv(3, name="smooth3")(p3))
        p4 = nn.relu(conv(3, name="smooth4")(p4))
        p5 = nn.relu(conv(3, name="smooth5")(p5))

        pyramid = [p3, p4, p5]
        x = p5
        for i in range(self.levels - 3):
            x = conv(3, s=2, name=f"down{6 + i}")(x)
            pyramid.append(x)
        return pyramid


def _upsample_to(x, target_shape):
    """Bilinear upsample to the target spatial shape (the RESIZE_BILINEAR ops).

    Runs in the input dtype: a 2× bilinear blend is a 2-tap convex sum whose
    weights are exact in bf16, and the f32 round trip materialized 2× the
    bytes on the hottest FPN tensors (batch-16 VGA trace, docs/performance.md).
    """
    b, h, w, c = x.shape
    th, tw = target_shape[1], target_shape[2]
    return jax.image.resize(x, (b, th, tw, c), method="bilinear")
