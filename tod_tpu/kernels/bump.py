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
toolchain): dynamic-offset ref slices crash or fail to lower in BOTH the lane
and sublane dims, so every displacement offset must be a *static* slice.
That rules out a 1600-iteration loop for robots; instead:

- **constant peak value** (robots, val=100): handled by the separable
  closed form in ``geometry.fusion._dilate_const_separable`` (exact; see its
  docstring) — the in-kernel variant both hits the dynamic-slice limitation
  and overflows VMEM liveness with 80 unrolled full-height slices.
- **variable peak value** (terrain, val = source row): fully-unrolled (2L)²
  static double loop with the vectorized sigmoid, VMEM-resident (this file).
  Viable for small windows only — the unrolled load chain's VMEM liveness
  grows as (2L)²·H·W·4B, so at the reference's terrain L=10 on VGA frames the
  production path uses the XLA-fused loop in geometry.fusion instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e9  # "no source in window" sentinel for min-distance²


def _kernel_var_strips(hbm_ref, out_ref, *, strip_h, w, pad, L, bump_err):
    """Strip-tiled variable-value dilation.

    The padded peak map stays in HBM (memory_space=ANY); each grid program
    DMAs its (strip + 2L halo) rows into VMEM scratch — DMA slicing supports
    the dynamic (program-id-dependent) row offset that vector-lane slicing
    doesn't — then runs the (2L)² static displacement loop over the strip.
    Unrolled-load liveness is bounded by (2L)²·strip_h·W·4B instead of
    (2L)²·H·W·4B, which is what kept the whole-array variant off VGA frames.

    Hardware status (this container's remote-compile Mosaic build): validated
    exact in interpret mode; on the real chip the compile helper crashes on
    ANY lane-unaligned static slice of a DMA'd scratch buffer (bisected: a
    bare halo-DMA + interior slice already crashes, while the same structure
    with aligned (strip, W) scratch and full-width reads compiles and runs
    correctly).  The production occupancy path therefore stays on the
    XLA-fused loop (geometry.fusion); this kernel is the intended design for
    a toolchain where that compiler bug is fixed.
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
        acc = jnp.zeros((strip_h, w), jnp.float32)
        for dy in range(-L, L):
            for dx in range(-L, L):
                prox = float((dy * dy + dx * dx) ** 0.5)
                src = scratch[pl.ds(pad - dy, strip_h), pl.ds(pad - dx, w)]
                c1 = jnp.maximum(src / bump_err - 1.0, 1e-6)
                g = jnp.floor(src / (1.0 + jnp.power(c1, c2 * prox - 1.0)))
                acc = jnp.maximum(acc, jnp.where(src > 0, g, 0.0))
        out_ref[:] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((strip_h + 2 * pad, w + 2 * pad), jnp.float32),
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
    kernel = functools.partial(
        _kernel_var_strips, strip_h=strip_h, w=w, pad=pad, L=bump_size,
        bump_err=bump_err,
    )
    grid = (h // strip_h,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (strip_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(peaks_ext.astype(jnp.float32))


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
