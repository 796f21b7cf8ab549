"""Int8 quantized convolution — the end-to-end quantized inference path.

The reference's graph is u8-quantized end to end: every tensor in the tflite
blob carries a (scale, zero_point) and the host dequantizes outputs with
``scale * (x - zero_point)`` (src/yolact.rs:172-177; 8.05 MiB u8 blob per
data/README.md:27-32).  ``Conv8`` is the TPU-native counterpart: symmetric
int8 weights (per output channel) × dynamically-quantized int8 activations
(per tensor), accumulated in int32 on the MXU, dequantized to float once per
layer.  Symmetric quantization drops the zero-points (they exist in tflite
because u8 is unsigned); accuracy is equivalent and the MXU path stays a pure
integer matmul.

Param names and shapes are identical to ``flax.linen.Conv`` ("kernel",
"bias"), so any float checkpoint loads directly — quantization happens at
apply time from the f32 weights, exactly like the weight-only PTQ in
ops/quantize.py but extended to activations and integer accumulation.

Backend selection: XLA:TPU lowers s8×s8→s32 ``conv_general_dilated`` onto the
MXU natively; other backends (and interpret-mode tests) use a float-simulated
conv over the *same quantized integer values* — products ≤ 127² are exact in
f32, so the two paths agree to float-accumulation rounding (~1e-7 relative).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_symmetric(x, axis=None, bits: int = 8):
    """x f32 → (int8 values, f32 scale broadcastable over x).

    Symmetric signed quantization: scale = amax/127, q = round(x/scale).
    ``axis=None`` → per-tensor; otherwise amax is reduced over ``axis``.
    """
    qmax = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax / qmax, 1e-12).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def _int8_conv_supported() -> bool:
    return jax.default_backend() == "tpu"


class Conv8(nn.Module):
    """Drop-in int8 replacement for ``nn.Conv`` (NHWC / HWIO).

    Only the features the YOLACT graph uses are implemented: SAME padding,
    square strides, feature_group_count (depthwise), optional bias.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Any = 1
    padding: str = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    native_int8: bool | None = None  # None = auto (TPU yes, else float-sim)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        strides = (
            (self.strides, self.strides) if isinstance(self.strides, int) else tuple(self.strides)
        )

        wq, sw = quantize_symmetric(kernel.astype(jnp.float32), axis=(0, 1, 2))  # (1,1,1,Cout)
        xq, sx = quantize_symmetric(x.astype(jnp.float32), axis=None)  # per-tensor

        native = self.native_int8
        if native is None:
            native = _int8_conv_supported()
        if native:
            acc = jax.lax.conv_general_dilated(
                xq,
                wq,
                window_strides=strides,
                padding=self.padding,
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            # float-simulated integer conv: same quantized values, f32 accum
            acc = jax.lax.conv_general_dilated(
                xq.astype(jnp.float32),
                wq.astype(jnp.float32),
                window_strides=strides,
                padding=self.padding,
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = acc * (sx * sw.reshape(1, 1, 1, -1))
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def conv_factory(quantized: bool):
    """Returns the conv module class for a quantization mode — ``nn.Conv``
    (bf16 MXU path) or :class:`Conv8`.  Both accept the same constructor
    kwargs used across the model family and create identical param trees."""
    return Conv8 if quantized else nn.Conv
