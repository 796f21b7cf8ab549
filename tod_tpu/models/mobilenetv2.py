"""MobileNetV2 backbone, from scratch in Flax.

The reference's model is a MobileNetV2-backbone YOLACT variant shipped as an
opaque tflite blob (data/README.md:10; op inventory CONV_2D×64,
DEPTHWISE_CONV_2D×15, ADD×11 inverted-residual skips — data/FRC_model_edgetpu.log,
SURVEY.md §2.3).  This is the from-scratch float graph: standard MobileNetV2
inverted-residual stack, returning the C3/C4/C5 feature pyramid taps for FPN.

TPU notes: NHWC layout throughout (XLA:TPU's native conv layout), bfloat16
compute with float32 params/batch-stats, SAME padding so any input size works
(no fixed 224×224 window like the Edge TPU, src/yolact.rs:143-158).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tod_tpu.models.qconv import conv_factory
from tod_tpu.ops.depthwise import depthwise_conv_shifted, shifted_wins
from tod_tpu.ops.s2d import s2d_stem_conv


def _make_divisible(v: float, divisor: int = 8) -> int:
    """Round channel counts like the MobileNetV2 paper (multiples of 8 — which
    also keeps lane tiling friendly on TPU)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class DepthwiseShifted(nn.Module):
    """Depthwise conv with the shifted-add formulation (ops/depthwise.py).

    Param tree ("kernel", same HWIO (k,k,1,C) shape, same init path) is
    identical to ``nn.Conv(feature_group_count=C, name=...)``, so float
    checkpoints load either way and init RNG draws match bit-for-bit."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            self.param_dtype,
        )
        return depthwise_conv_shifted(x, kernel, self.stride).astype(self.dtype)


class S2DStemConv(nn.Module):
    """Stride-2 3×3 stem conv computed as a 2×2 s1 conv on space-to-depth
    input (ops/s2d.py — exact weight transform).  Param tree ("kernel",
    (3,3,C,O) HWIO, lecun init) is identical to the ``nn.Conv`` it replaces,
    so pinned checkpoints load either way."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            self.param_dtype,
        )
        return s2d_stem_conv(x.astype(self.dtype), kernel).astype(self.dtype)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16
    quantized: bool = False
    dw_shifted: bool = False  # ModelConfig.depthwise_shifted (measured negative)
    s2d: bool = False  # ModelConfig.s2d_stem: space-to-depth stem (ops/s2d.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit name: keeps the param path identical ("Conv_0") across
        # nn.Conv / Conv8 / DepthwiseShifted, so float checkpoints load any way
        depthwise = self.groups > 1 and self.groups == x.shape[-1]
        use_shifted = (
            depthwise
            and self.dw_shifted
            and shifted_wins(x.shape[-1], self.stride)
        )
        if (
            self.s2d
            and not self.quantized
            and not depthwise
            and self.kernel == 3
            and self.stride == 2
        ):
            conv = S2DStemConv(self.features, dtype=self.dtype, name="Conv_0")
        elif use_shifted and not self.quantized:
            conv = DepthwiseShifted(
                self.features,
                kernel_size=self.kernel,
                stride=self.stride,
                dtype=self.dtype,
                name="Conv_0",
            )
        else:
            extra = {"shifted_depthwise": use_shifted} if self.quantized else {}
            conv = conv_factory(self.quantized)(
                self.features,
                (self.kernel, self.kernel),
                strides=self.stride,
                padding="SAME",
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="Conv_0",
                **extra,
            )
        x = conv(x)
        # BN statistics/params stay f32; the normalization itself runs in the
        # compute dtype at inference — the f32 round trip showed up as ~1 ms
        # of clamp/convert fusions per batch-16 VGA step (docs/performance.md).
        # Training keeps f32 normalization (batch-stat update precision).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            dtype=jnp.float32 if train else self.dtype,
        )(x)
        if self.act:
            x = nn.relu6(x)
        return x.astype(self.dtype)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    dtype: Any = jnp.bfloat16
    quantized: bool = False
    dw_shifted: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand
        q = self.quantized
        y = x
        if self.expand != 1:
            y = ConvBN(hidden, kernel=1, dtype=self.dtype, quantized=q)(y, train)
        # depthwise
        y = ConvBN(
            hidden, kernel=3, stride=self.stride, groups=hidden, dtype=self.dtype,
            quantized=q, dw_shifted=self.dw_shifted,
        )(y, train)
        # linear projection
        y = ConvBN(self.features, kernel=1, act=False, dtype=self.dtype, quantized=q)(
            y, train
        )
        if self.stride == 1 and inp == self.features:
            y = y + x  # the ADD×11 skips in the reference op inventory
        return y


# (expand_ratio, channels, num_blocks, first_stride)
_MNV2_CFG: Sequence[tuple[int, int, int, int]] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),  # stride 4
    (6, 32, 3, 2),  # stride 8  → C3 tap
    (6, 64, 4, 2),  # stride 16
    (6, 96, 3, 1),  #            → C4 tap
    (6, 160, 3, 2),  # stride 32
    (6, 320, 1, 1),  #           → C5 tap
)


class MobileNetV2(nn.Module):
    """Returns (C3, C4, C5) at strides (8, 16, 32)."""

    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16
    quantized: bool = False
    dw_shifted: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # S2D needs even spatial dims (every supported input size is)
        s2d = self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        x = ConvBN(
            _make_divisible(32 * self.width_mult), stride=2, dtype=self.dtype,
            quantized=self.quantized, s2d=s2d,
        )(x, train)
        taps = {}
        for stage, (t, c, n, s) in enumerate(_MNV2_CFG):
            feats = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    feats, stride=s if i == 0 else 1, expand=t, dtype=self.dtype,
                    quantized=self.quantized, dw_shifted=self.dw_shifted,
                )(x, train)
            if stage == 2:
                taps["c3"] = x
            elif stage == 4:
                taps["c4"] = x
            elif stage == 6:
                taps["c5"] = x
        return taps["c3"], taps["c4"], taps["c5"]
