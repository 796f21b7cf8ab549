"""Pixel/word packing utilities, wire-compatible with the reference.

The reference packs camera RGB into big-endian u32 words ``r<<24 | g<<16 | b<<8``
(src/scene.rs:86) and postprocessed class/id into ``cls<<24, id<<16`` — with a
latent bug: it combines them with ``&`` instead of ``|`` (src/yolact.rs:127 and the
shader pack at shaders/pt_cloud_weights.comp:26), which always yields 0.  Per
SURVEY.md §3.6 we implement the *intent*: ``cls<<24 | id<<16``.

On device we keep channels as separate arrays (packed u32 words defeat XLA's
vectorization); packing exists at the host boundary for wire/trace parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_rgb_u32(rgb):
    """(…, 3) uint8 → (…,) uint32, big-endian ``r<<24 | g<<16 | b<<8``."""
    r = rgb[..., 0].astype(jnp.uint32)
    g = rgb[..., 1].astype(jnp.uint32)
    b = rgb[..., 2].astype(jnp.uint32)
    return (r << 24) | (g << 16) | (b << 8)


def unpack_rgb_u32(words):
    """(…,) uint32 → (…, 3) uint8, inverse of :func:`pack_rgb_u32`."""
    words = words.astype(jnp.uint32)
    r = (words >> 24) & 0xFF
    g = (words >> 16) & 0xFF
    b = (words >> 8) & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)


def pack_class_id(cls, ids):
    """Class/instance-id maps → u32 words ``cls<<24 | id<<16``.

    ``ids`` uses -1 for "no instance" (we store its low 8 bits, so -1 → 0xFF;
    the reference's i8 ids behave identically when reinterpreted as u8).
    """
    c = cls.astype(jnp.uint32) & 0xFF
    i = ids.astype(jnp.uint32) & 0xFF
    return (c << 24) | (i << 16)


def unpack_class_id(words):
    """u32 words → (cls uint8, id int32 with 0xFF mapped back to -1)."""
    words = words.astype(jnp.uint32)
    cls = ((words >> 24) & 0xFF).astype(jnp.uint8)
    raw = ((words >> 16) & 0xFF).astype(jnp.int32)
    ids = jnp.where(raw == 0xFF, -1, raw)
    return cls, ids


def class_id_to_u16(cls, ids):
    """The 16-bit target-buffer form pushed to the fusion stage.

    The reference takes the *low* 16 bits of the packed word (src/scene.rs:93)
    while class/id live in the high 16 — inconsistent with its own comment
    ("last 8 store the class", src/scene.rs:91).  Intent: carry (class, id), which
    the fusion stage reads back as two u8 channels (R8G8_UINT, src/scene.rs:198).
    We pack ``cls | id<<8`` so byte 0 = class, byte 1 = id, matching how R8G8_UINT
    reinterprets a little-endian u16.
    """
    c = cls.astype(jnp.uint32) & 0xFF
    i = ids.astype(jnp.uint32) & 0xFF
    return (c | (i << 8)).astype(jnp.uint16)


def u16_to_class_id(words):
    """Inverse of :func:`class_id_to_u16`."""
    words = words.astype(jnp.uint32)
    cls = (words & 0xFF).astype(jnp.uint8)
    raw = ((words >> 8) & 0xFF).astype(jnp.int32)
    ids = jnp.where(raw == 0xFF, -1, raw)
    return cls, ids


def unpack_height_balls(buf, h: int, w: int):
    """Host-side inverse of the serving step's packed scene readback:
    ``[h·w·2 bytes f16 height][16·N bytes f32 (x̄, ȳ, count, 0) balls]``
    — ball slots are indexed by instance id and carry the running-average
    centroid as (mean col, mean row, pixel count, 0), matching
    geometry/fusion.ball_centroids and the shader's Balls SSBO layout.

    ONE shared decode of the wire-compact layout emitted by
    ``Engine._serve_step_packed`` — used by the Engine's host-planner path
    and by frozen-artifact loaders (tod_tpu/deploy.py), so the byte
    contract has a single owner.  Returns ``(height f16 (h, w) view,
    balls f32 (N, 4))`` as numpy arrays backed by ``buf``.
    """
    import numpy as np

    n = h * w * 2
    height = buf[:n].view(np.float16).reshape(h, w)
    balls = buf[n:].view(np.float32).reshape(-1, 4)
    return height, balls
