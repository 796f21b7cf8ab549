"""ResNet backbones (18/34/50), the YOLACT paper's reference backbone family.

The reference repo shipped only the MobileNetV2 variant (data/README.md:10); the
YOLACT paper uses ResNet-50/101.  Providing both families makes the framework a
superset: ``ModelConfig.backbone`` selects at construction time.  Same layout
conventions as mobilenetv2.py (NHWC, bf16 compute, f32 params).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tod_tpu.models.qconv import conv_factory


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(f, k, s, name):
            return conv_factory(self.quantized)(
                f, (k, k), strides=s, padding="SAME", use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.97, dtype=jnp.float32,
                name=name,
            )

        y = conv(self.features, 3, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y).astype(self.dtype))
        y = conv(self.features, 3, 1, "conv2")(y)
        y = bn("bn2")(y).astype(self.dtype)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv(self.features, 1, self.stride, "down")(x)
            x = bn("bn_down")(x).astype(self.dtype)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4*features
    stride: int = 1
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(f, k, s, name):
            return conv_factory(self.quantized)(
                f, (k, k), strides=s, padding="SAME", use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.97, dtype=jnp.float32,
                name=name,
            )

        out = self.features * 4
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)).astype(self.dtype))
        y = nn.relu(
            bn("bn2")(conv(self.features, 3, self.stride, "conv2")(y)).astype(self.dtype)
        )
        y = bn("bn3")(conv(out, 1, 1, "conv3")(y)).astype(self.dtype)
        if self.stride != 1 or x.shape[-1] != out:
            x = bn("bn_down")(conv(out, 1, self.stride, "down")(x)).astype(self.dtype)
        return nn.relu(y + x)


_RESNET_CFG = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNet(nn.Module):
    """Returns (C3, C4, C5) at strides (8, 16, 32)."""

    variant: str = "resnet18"
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, depths = _RESNET_CFG[self.variant]
        # explicit name: same param path ("Conv_0") for nn.Conv and Conv8
        x = conv_factory(self.quantized)(
            64, (7, 7), strides=2, padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="Conv_0",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97, dtype=jnp.float32)(x)
        x = nn.relu(x.astype(self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        taps = []
        for i, (feats, n) in enumerate(zip((64, 128, 256, 512), depths)):
            for j in range(n):
                x = block(
                    feats, stride=2 if (i > 0 and j == 0) else 1, dtype=self.dtype,
                    quantized=self.quantized,
                )(x, train)
            taps.append(x)
        return taps[1], taps[2], taps[3]
