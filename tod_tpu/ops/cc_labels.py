"""Connected-component instance labels, TPU-style.

Replaces ``terrible_id``'s stack-based 4-neighbor flood fill (src/yolact.rs:52-88),
which is inherently sequential and cannot express under XLA.  The idiomatic form is
iterated min-label propagation to a fixpoint inside ``lax.while_loop``
(SURVEY.md §7 "Hard parts": worklist algorithms → label propagation):

1. every masked pixel starts labeled with its own linear index,
2. each step takes the min over itself + 4 neighbors (masked),
3. at the fixpoint every component carries the min linear index of its pixels,
4. labels are compacted to dense ids 0..k-1 by rank of that min index — which is
   exactly the reference's id order (it seeds flood fills in row-major scan order,
   so component id order == order of each component's first/min pixel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = jnp.iinfo(jnp.int32).max


def _propagate_once(labels, mask):
    """One min-propagation step over the 4-neighborhood."""
    padded = jnp.pad(labels, 1, constant_values=_SENTINEL)
    n = jnp.minimum(
        jnp.minimum(padded[:-2, 1:-1], padded[2:, 1:-1]),
        jnp.minimum(padded[1:-1, :-2], padded[1:-1, 2:]),
    )
    new = jnp.minimum(labels, n)
    return jnp.where(mask, new, _SENTINEL)


def connected_components(mask, max_labels: int = 100, max_iters: int | None = None):
    """4-connected components of a boolean (H, W) mask → (H, W) int32 ids.

    Unmasked pixels get -1 (matching the reference's "none" id,
    src/yolact.rs:54).  Ids are dense, assigned in row-major order of each
    component's first pixel, clamped to ``max_labels - 1`` (the reference's ball
    SSBO holds 100 slots, shaders/pt_cloud.comp:17).
    """
    h, w = mask.shape
    mask = mask.astype(bool)
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels0 = jnp.where(mask, lin, _SENTINEL)
    if max_iters is None:
        max_iters = h * w  # serpentine worst case; typical convergence is ~diameter

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = _propagate_once(labels, mask)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.array(True), jnp.array(0, jnp.int32))
    )

    # Compact: a "representative" pixel is one whose label equals its own index.
    flat = labels.reshape(-1)
    rep = jnp.where(flat == jnp.arange(h * w, dtype=jnp.int32), 1, 0)
    # exclusive prefix sum → rank of each representative among representatives
    rank = jnp.cumsum(rep) - rep
    safe = jnp.clip(flat, 0, h * w - 1)
    ids = jnp.where(flat == _SENTINEL, -1, rank[safe].astype(jnp.int32))
    ids = jnp.where(ids >= 0, jnp.minimum(ids, max_labels - 1), -1)
    return ids.reshape(h, w)
