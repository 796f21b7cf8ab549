"""Spatial partitioning: shard the image H axis across devices.

The reference's spatial story is tiling-because-the-window-is-small
(448×224 → two 224×224 tiles, src/yolact.rs:207-217 — SURVEY.md §2.4 calls this
the sequence-parallel analog).  On TPU the equivalent *scaling* capability is
GSPMD spatial partitioning: annotate the activation H axis onto a mesh axis and
XLA partitions every conv with halo exchanges on ICI automatically — the
halo-exchange-conv analog of ring attention for vision models.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharded_forward(apply_fn: Callable, mesh: Mesh, axis: str = "dp"):
    """Wrap ``apply_fn(params, images)`` so images are sharded over their H
    axis (NHWC dim 1) on ``axis``; params replicated.  XLA inserts the conv
    halo exchanges."""

    img_sh = NamedSharding(mesh, P(None, axis, None, None))

    def wrapped(params, images):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        return apply_fn(params, images)

    return jax.jit(wrapped, in_shardings=(NamedSharding(mesh, P()), img_sh))
