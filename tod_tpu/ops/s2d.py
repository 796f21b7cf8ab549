"""Space-to-depth stem: the stride-2 3×3 RGB stem conv as an exact 2×2
stride-1 conv on 2×2 space-to-depth input.

Why: a 3-input-channel conv is the worst case for the MXU — the im2col
contraction is k·k·3 = 27 wide against 128-lane tiles, and XLA additionally
lays the (B, H, W, 3) input out with the 3-channel axis minormost
(T(4,128) tiling, 125/128 lanes dead).  The batch-16 VGA device trace
(docs/performance.md) shows the stem region costing ~1.5 ms of a 6.1 ms
step: 0.58 ms input layout copy + 0.97 ms stem conv fusion.  Space-to-depth
re-expresses the same math on a (B, H/2, W/2, 12) input — 4× the lanes, a
4× smaller spatial grid, and a 48-wide contraction.

Exactness (not an approximation): output pixel (i, j) of the stride-2 conv
sums x[2i+di, 2j+dj]·W[di, dj] over di, dj ∈ {0,1,2}.  With blocks
y[i, j, (pi·2+pj)·C + c] = x[2i+pi, 2j+pj, c], a 2×2 stride-1 conv over y
reaches exactly the offsets 2ki+pi ∈ {0,1,2,3}; mapping W'[ki, kj, block]
= W[2ki+pi, 2kj+pj] for offsets ≤ 2 and zero for the unused offset 3
reproduces the original sum term-for-term.  SAME padding for (k=3, s=2) on
even H is (0, 1), which becomes a (0, 1) zero *block* on y — supplied by
the transformed conv's own (0, 1) padding.  Even H, W required (asserted).

The kernel transform runs inside the forward on the untransformed (3,3,C,O)
param — 864 elements, constant-folded-scale work — so checkpoints and init
RNG draws are bit-identical to the plain ``nn.Conv`` stem and the flag can
be flipped on any pinned checkpoint (gated by tests/test_ops.py exactness
and the golden detection metrics).

Reference counterpart: none — the Edge TPU compiler ingested the 224×224×3
u8 input directly (src/yolact.rs:143-158); this is a TPU-specific layout
optimization.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def space_to_depth(x):
    """(B, H, W, C) → (B, H/2, W/2, 4C); block order (pi, pj, c)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "space_to_depth needs even H, W"
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, pi, pj, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_s2d(kernel):
    """(3, 3, C, O) stride-2 kernel → (2, 2, 4C, O) stride-1 S2D kernel.

    Zero-pads the 3×3 taps to 4×4 (the offset-3 row/col is unreachable by
    the original conv) and regroups (2ki+pi) → (ki, pi) to match
    :func:`space_to_depth`'s (pi, pj, c) block order.
    """
    k1, k2, c, o = kernel.shape
    assert (k1, k2) == (3, 3), "stem transform is for 3×3 stride-2 convs"
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (4,4,C,O)
    kp = kp.reshape(2, 2, 2, 2, c, o)  # (ki, pi, kj, pj, c, o)
    kp = kp.transpose(0, 2, 1, 3, 4, 5)  # (ki, kj, pi, pj, c, o)
    return kp.reshape(2, 2, 4 * c, o)


def s2d_stem_conv(x, kernel, preferred=None):
    """Exact replacement for SAME-padded ``conv(x, kernel, stride=2)``.

    x: (B, H, W, C) with even H, W; kernel: (3, 3, C, O).  Accumulates in
    ``preferred`` (e.g. f32) like the conv it replaces.
    """
    y = space_to_depth(x)
    k = stem_kernel_s2d(kernel.astype(x.dtype))
    return lax.conv_general_dilated(
        y,
        k,
        window_strides=(1, 1),
        padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
