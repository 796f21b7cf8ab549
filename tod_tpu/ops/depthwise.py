"""Depthwise convolution as shifted multiply-adds — a measured NEGATIVE result.

XLA:TPU lowers ``conv_general_dilated(feature_group_count=C)`` through a
transposed-layout path that shows up in device traces as convolution+copy
pairs (docs/performance.md).  A depthwise kernel is just a per-channel
stencil, so the same math is expressible as kh·kw strided slices of the
padded input, each scaled by a per-channel scalar vector and summed — pure
elementwise NHWC work with no conv lowering at all.

Measured on v5e (batch-16 VGA MNv2 shapes, serialized-chain timing): in
*isolation* this wins 2.30x at 240×320×32 s1 and 1.32x at 120×160×144 s1 —
but only because a lone conv pays a layout copy at the graph boundary.
Inside the full backbone, consecutive convs chain layouts copy-free, and
inserting elementwise blocks forces layout round trips around each one: the
flagship batch-16 VGA forward went 6.69 → 10.53 ms with the formulation
enabled even under the narrow win-only policy below.  Stride-2 variants lose
3-5x outright (strided slice reads defeat vectorization).  Hence
``ModelConfig.depthwise_shifted`` is default-off; the op stays as an exact,
tested alternative formulation (``tests/test_ops.py`` pins it against
``lax.conv_general_dilated``, value and gradient) and as the written record
of the measurement.

The formulation is mathematically the same convolution (identical taps,
accumulated in f32, SAME padding computed exactly as XLA computes it), so
pinned checkpoints load unchanged either way.
"""

from __future__ import annotations

import jax.numpy as jnp

# Per-shape ISOLATION measurements on v5e (batch-16 VGA MNv2 depthwise
# shapes, serialized-chain timing), lax conv -> shifted:
#
#   240x320x32  s1: 1.95 -> 0.85 ms (2.30x)     120x160x144 s2: 1.21 -> 4.6 ms (0.26x)
#   120x160x144 s1: 1.20 -> 0.91 ms (1.32x)     240x320x96  s2: 1.82 -> 9.8 ms (0.19x)
#   60x80x192   s1: 0.54 -> 0.67 ms (0.81x)     60x80x192   s2: 0.49 -> 1.1 ms (0.43x)
#   30x40x384+  s1: ~wash (0.95-0.97x)
#
# Stride-2 slices read every other row/col of the padded tensor — XLA cannot
# vectorize those loads.  The stride-1 narrow-channel isolation wins did NOT
# survive in the full graph (module docstring): this policy exists so the
# opt-in flag at least picks only the least-bad shapes.
SHIFTED_MAX_CHANNELS = 144


def shifted_wins(channels: int, stride: int) -> bool:
    """True where the shifted formulation measured faster than the conv
    lowering on v5e *in isolation* (see table above): unit stride, narrow
    channels.  Even these regress inside the fused backbone — see module
    docstring; ``ModelConfig.depthwise_shifted`` defaults off."""
    return stride == 1 and channels <= SHIFTED_MAX_CHANNELS


def same_pads(
    in_hw: tuple[int, int], k: int, stride: int
) -> tuple[tuple[int, int], tuple[int, int]]:
    """(lo, hi) padding per spatial dim, exactly XLA's SAME convention."""
    pads = []
    for d in (0, 1):
        out = -(-in_hw[d] // stride)
        total = max((out - 1) * stride + k - in_hw[d], 0)
        pads.append((total // 2, total - total // 2))
    return pads[0], pads[1]


def depthwise_conv_shifted(x, kernel, stride: int = 1):
    """Depthwise conv via shifted adds.  ``x`` (B,H,W,C) NHWC, ``kernel``
    (kh,kw,1,C) HWIO exactly as ``nn.Conv(feature_group_count=C)`` stores it;
    SAME padding; f32 accumulation; returns ``x.dtype``."""
    kh, kw, _, c = kernel.shape
    (plh, phh), (plw, phw) = same_pads(x.shape[1:3], kh, stride)
    out_h = -(-x.shape[1] // stride)
    out_w = -(-x.shape[2] // stride)
    xp = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    kf = kernel.astype(jnp.float32)
    acc = jnp.zeros((x.shape[0], out_h, out_w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            sl = xp[
                :,
                i : i + stride * (out_h - 1) + 1 : stride,
                j : j + stride * (out_w - 1) + 1 : stride,
                :,
            ]
            acc = acc + sl.astype(jnp.float32) * kf[i, j, 0]
    return acc.astype(x.dtype)
