"""Fused on-device preprocessing.

The reference preprocess (src/yolact.rs:192-217) runs on the Pi's CPU: unpack u32
pixels → ``resize_exact(448, 224, Triangle)`` → crop two 224×224 tiles → copy each
into the tflite input tensor.  SURVEY.md §3.3 measures ~8 avoidable full-frame CPU
passes per classify.  Here the whole transform is jnp inside the jit'd graph —
XLA fuses unpack/resize/normalize/layout into the first conv's input pipeline, and
the "tile" path is a batched ``vmap``-style reshape, not two sequential invokes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_triangle(img, out_hw: tuple[int, int]):
    """Triangle-filter resize, matching the image crate's ``FilterType::Triangle``
    (src/yolact.rs:208).  ``jax.image.resize`` with ``method="linear"`` and
    antialiasing is the same family (tent kernel scaled by the resize factor).

    img: (..., H, W, C) any float/int dtype; returns float32.
    """
    img = img.astype(jnp.float32)
    out_shape = (*img.shape[:-3], *out_hw, img.shape[-1])
    return jax.image.resize(img, out_shape, method="linear", antialias=True)


def normalize(img_f32, dtype=jnp.bfloat16):
    """uint8-range [0,255] → [-1, 1] in the MXU compute dtype.

    The reference feeds raw u8 into a quantized graph (src/yolact.rs:161-162);
    our float model uses symmetric normalization (the float-training analog of its
    u8 input quantization with zero_point at mid-range).
    """
    return ((img_f32 / 127.5) - 1.0).astype(dtype)


def preprocess_frame(rgb, out_hw: tuple[int, int], dtype=jnp.bfloat16):
    """Full-frame path: (H, W, 3) uint8 → (1, h, w, 3) normalized, NHWC.

    One fused resize+normalize+layout transform; no host round-trips
    (replaces src/yolact.rs:195-208 which did this in 3 CPU passes).
    """
    x = resize_triangle(rgb, out_hw)
    return normalize(x, dtype)[None]


def tile_448x224(rgb):
    """Legacy tile-parity path: 640×480 frame → (2, 224, 224, 3) batch.

    Reproduces src/yolact.rs:207-214 (resize_exact(448,224,Triangle), crop two
    224×224 tiles) — but as a *batch* so both tiles run in one device pass
    instead of two sequential interpreter invokes (src/yolact.rs:216-217).
    """
    small = resize_triangle(rgb, (224, 448))  # (224, 448, 3)
    tiles = jnp.stack([small[:, :224], small[:, 224:]], axis=0)
    return tiles


def stitch_tiles(tiles):
    """(2, 224, 224, C) → (224, 448, C), inverse of the tile split
    (src/yolact.rs:219-220)."""
    return jnp.concatenate([tiles[0], tiles[1]], axis=1)


def upscale_to_frame(img, frame_hw: tuple[int, int] = (480, 640)):
    """Nearest-neighbor upscale of a class/id map back to frame resolution.

    The reference uses a *Triangle* resize on the packed u32 class words
    (src/yolact.rs:230-233) — interpolating packed categorical words is a latent
    bug (blends class codes); the intent is a categorical upscale, so we use
    nearest (SURVEY.md §3.6 policy: reproduce intent, not bugs).
    """
    out_shape = (*frame_hw, *img.shape[2:]) if img.ndim > 2 else frame_hw
    return jax.image.resize(img, out_shape, method="nearest")
