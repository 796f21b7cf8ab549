"""Occupancy "bump" dilation Pallas kernel.

TPU replacement for the scatter side of ``bump_img_store``
(shaders/pt_cloud.comp:45-76): the shader scatters a sigmoid mound around every
source pixel with ``imageAtomicMax``; we invert it into a gather
(``out[o] = max_d floor(g(peak[o−d], |d|))`` — SURVEY.md §7 "Scatter-max bump
kernel") and run the whole displacement reduction with the padded peak map and
the accumulator resident in VMEM.

Why a kernel: under plain XLA the displacement loop lowers to one full-array
HBM read-modify-write per displacement — for the robot radius (L=20 → 1600
displacements over a 640×480 map) that's ~4 GB of HBM traffic for ~1 MB of live
data.  Here HBM traffic is one read of the padded peaks + one write of the
output; the 1600-step max-reduce runs at VPU speed out of VMEM.

Two modes:
- variable peak values (terrain: value = source row) — computes the sigmoid
  per displacement on the VPU;
- constant peak value (robots: 100.0) — the per-displacement bump value is a
  scalar, precomputed host-side into a table; the loop is then a pure
  masked-max (no transcendentals).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bump_scalar_table(bump_size: int, val: float, bump_err: float) -> np.ndarray:
    """floor(g(val, r)) for every displacement in the (2L)² window, flattened."""
    L = bump_size
    side = 2 * L
    c1 = val / bump_err - 1.0
    c2 = 2.0 / L
    tbl = np.zeros((side * side,), np.float32)
    for i in range(side * side):
        dy, dx = i // side - L, i % side - L
        prox = math.sqrt(dy * dy + dx * dx)
        tbl[i] = float(int(val / (1.0 + c1 ** (c2 * prox - 1.0))))
    return tbl


def _kernel_const(peaks_ref, tbl_ref, out_ref, *, h, w, pad, L):
    side = 2 * L

    def body(i, acc):
        dy = i // side - L
        dx = i % side - L
        src = peaks_ref[pl.ds(pad - dy, h), pl.ds(pad - dx, w)]
        contrib = jnp.where(src > 0, tbl_ref[i], 0.0)
        return jnp.maximum(acc, contrib)

    out_ref[:] = jax.lax.fori_loop(0, side * side, body, jnp.zeros((h, w), jnp.float32))


def _kernel_var(peaks_ref, out_ref, *, h, w, pad, L, bump_err):
    side = 2 * L
    c2 = 2.0 / L

    def body(i, acc):
        dy = i // side - L
        dx = i % side - L
        prox = jnp.sqrt(jnp.float32((dy - 0) ** 2 + (dx - 0) ** 2))
        src = peaks_ref[pl.ds(pad - dy, h), pl.ds(pad - dx, w)]
        c1 = jnp.maximum(src / bump_err - 1.0, 1e-6)
        g = jnp.floor(src / (1.0 + jnp.power(c1, c2 * prox - 1.0)))
        return jnp.maximum(acc, jnp.where(src > 0, g, 0.0))

    out_ref[:] = jax.lax.fori_loop(0, side * side, body, jnp.zeros((h, w), jnp.float32))


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
        tbl = jnp.asarray(_bump_scalar_table(L, constant_val, bump_err))
        kernel = functools.partial(_kernel_const, h=h, w=w, pad=pad, L=L)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(peaks_ext.astype(jnp.float32), tbl)
    kernel = functools.partial(_kernel_var, h=h, w=w, pad=pad, L=L, bump_err=bump_err)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(peaks_ext.astype(jnp.float32))
