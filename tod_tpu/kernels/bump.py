"""Occupancy "bump" dilation Pallas kernel.

TPU replacement for the scatter side of ``bump_img_store``
(shaders/pt_cloud.comp:45-76): the shader scatters a sigmoid mound around every
source pixel with ``imageAtomicMax``; we invert it into a gather
(``out[o] = max_d floor(g(peak[o−d], |d|))`` — SURVEY.md §7 "Scatter-max bump
kernel") and run the displacement reduction with everything resident in VMEM.

Why a kernel: under plain XLA the displacement loop lowers to one full-array
HBM round trip per displacement — for the robot radius (L=20 → 1600
displacements) that's gigabytes of HBM traffic for ~1 MB of live data.

Mosaic constraints shape the loop structure (found empirically on this
toolchain): lane-dim slices of VMEM scratch must be 128-aligned in offset AND
size, sublane slice sizes 8-aligned, and ``pltpu.roll`` needs an aligned
width and a non-negative shift (negative dynamic shifts silently corrupt
rolls wider than two lane tiles).  The production kernel
(``dilate_peaks_strips``) therefore walks the dx axis with full-width
circular rolls — never lane slices — and rounds the buffer to the alignment
grid; it is validated bit-exact against the jnp oracle ON HARDWARE at QVGA
and VGA.  The constant-peak robot bump stays on the separable closed form in
``geometry.fusion._dilate_const_separable`` (an algorithmic (2L)²→4L win no
displacement kernel can match).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e9  # "no source in window" sentinel for min-distance²


def _kernel_var_strips(hbm_ref, out_ref, *, strip_h, wp, pad, L, bump_err):
    """Strip-tiled variable-value dilation, lane-shift via circular roll.

    The padded peak map stays in HBM (memory_space=ANY); each grid program
    DMAs its (strip + 2P halo) full-width rows into VMEM scratch.  The lane
    (dx) displacement axis is walked with ``pltpu.roll`` on full-width rows —
    NEVER with lane slices: this toolchain's Mosaic build crashes on any
    lane-unaligned static slice of DMA'd scratch (bisected round 1; full-width
    reads + aligned stores compile and run).  Roll wrap-around values land
    only in the padding columns (|dx| ≤ L ≤ pad), never in the interior the
    caller extracts, so the circular shift is as good as a true shift.

    The row (dy) axis stays a static 2L-unrolled loop of full-width sublane
    slices; the dx axis is a ``fori_loop`` with a dynamic roll amount, so code
    size is O(2L), not O((2L)²), and VMEM liveness is one rolled strip + the
    accumulator.
    """
    c2 = 2.0 / L
    i = pl.program_id(0)  # read outside run_scoped (no grid ctx inside)

    def body(scratch, sem):
        rows = strip_h + 2 * pad
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * strip_h, rows), :], scratch, sem
        )
        dma.start()
        dma.wait()
        acc = jnp.zeros((strip_h, wp), jnp.float32)
        for dy in range(-L, L):
            # full-width sublane slice (static offset, aligned lanes)
            band = scratch[pl.ds(pad - dy, strip_h), :]

            def dx_step(k, a, band=band, dy=dy):
                dx = k - L
                # roll requires a non-negative shift (negative dynamic shifts
                # silently corrupt wide (>2 lane-tile) rolls on hardware)
                src = pltpu.roll(band, (dx + wp) % wp, axis=1)  # src[c] = band[c-dx]
                prox = jnp.sqrt(jnp.float32(dy * dy) + (dx * dx).astype(jnp.float32))
                c1 = jnp.maximum(src / bump_err - 1.0, 1e-6)
                g = jnp.floor(src / (1.0 + jnp.power(c1, c2 * prox - 1.0)))
                return jnp.maximum(a, jnp.where(src > 0, g, 0.0))

            acc = jax.lax.fori_loop(0, 2 * L, dx_step, acc)
        out_ref[:] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((strip_h + 2 * pad, wp), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


def dilate_peaks_strips(
    peaks_ext,
    bump_size: int,
    bump_err: float,
    out_shape: tuple[int, int],
    strip_h: int = 16,
    interpret: bool | None = None,
):
    """Grid-tiled variable-value dilation (works at VGA sizes; see
    _kernel_var_strips).  Requires H divisible by strip_h."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = out_shape
    pad = (peaks_ext.shape[0] - h) // 2
    if h % strip_h:
        raise ValueError(f"H={h} not divisible by strip_h={strip_h}")
    # Mosaic's lane roll needs a lane-aligned (multiple-of-128) width; round
    # up with zero columns on the right.  Zero peaks contribute nothing, and
    # interior columns only ever read cols [pad-L, pad+W+L) — never the
    # appended zeros or a wrapped lane.
    wp = peaks_ext.shape[1]
    wp_aligned = -(-wp // 128) * 128
    if wp_aligned != wp:
        peaks_ext = jnp.pad(peaks_ext, ((0, 0), (0, wp_aligned - wp)))
        wp = wp_aligned
    # The per-strip DMA copies (strip_h + 2·pad_row) rows; Mosaic requires the
    # sublane slice size be 8-aligned.  Round the ROW halo up to a multiple of
    # 4 (so strip_h%8==0 keeps the total aligned); the extra rows are inert —
    # the kernel's band slices only ever touch rows within ±L of the strip.
    # Lane padding is untouched: the final interior column slice stays at the
    # original ``pad``.
    pad_row = -(-pad // 4) * 4
    if pad_row != pad:
        e = pad_row - pad
        peaks_ext = jnp.pad(peaks_ext, ((e, e), (0, 0)))
    kernel = functools.partial(
        _kernel_var_strips, strip_h=strip_h, wp=wp, pad=pad_row, L=bump_size,
        bump_err=bump_err,
    )
    grid = (h // strip_h,)
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, wp), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (strip_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(peaks_ext.astype(jnp.float32))
    return jax.lax.dynamic_slice(out_full, (0, pad), (h, w))


def _kernel_var(peaks_ref, out_ref, *, h, w, pad, L, bump_err):
    c2 = 2.0 / L
    acc = jnp.zeros((h, w), jnp.float32)
    for dy in range(-L, L):
        for dx in range(-L, L):
            prox = float((dy * dy + dx * dx) ** 0.5)
            src = peaks_ref[pl.ds(pad - dy, h), pl.ds(pad - dx, w)]
            c1 = jnp.maximum(src / bump_err - 1.0, 1e-6)
            g = jnp.floor(src / (1.0 + jnp.power(c1, c2 * prox - 1.0)))
            acc = jnp.maximum(acc, jnp.where(src > 0, g, 0.0))
    out_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("bump_size", "bump_err", "out_shape", "constant_val", "interpret"),
)
def dilate_peaks(
    peaks_ext,
    bump_size: int,
    bump_err: float,
    out_shape: tuple[int, int],
    constant_val: float | None = None,
    interpret: bool | None = None,
):
    """Max-reduce the bump function over the displacement window.

    peaks_ext: (H + 2P, W + 2P) f32, P ≥ bump_size padding holding off-grid
    bump centers.  Matches ``tod_tpu.geometry.fusion._dilate_peaks`` (the jnp
    oracle) exactly; displacements span [−L, L−1]² per the shader's loop bounds.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = out_shape
    pad = (peaks_ext.shape[0] - h) // 2
    L = bump_size
    if constant_val is not None:
        # Constant peak value: delegate to the separable closed form in
        # geometry.fusion — exact, XLA-fused, and immune to the Mosaic
        # dynamic-slice limitation that killed the in-kernel variant (the
        # combined 80-slice kernel also overflows VMEM liveness at VGA sizes).
        from tod_tpu.geometry.fusion import _dilate_const_separable

        return _dilate_const_separable(
            peaks_ext, L, float(constant_val), bump_err, out_shape
        )
    kernel = functools.partial(_kernel_var, h=h, w=w, pad=pad, L=L, bump_err=bump_err)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(peaks_ext.astype(jnp.float32))
