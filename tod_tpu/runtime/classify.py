"""Wire-parity classify API: packed u32 frame in → packed class/id frame out.

Drop-in behavioral equivalent of ``Yolact::classify`` (src/yolact.rs:39-41,
192-234): accepts the reference's packed big-endian u32 color buffer
(``r<<24|g<<16|b<<8``), runs the model, and overwrites the buffer with
``cls<<24 | id<<16`` words (the reference's intended packing, SURVEY.md §3.6).

Two modes:
- full-frame (default): one fused pass at the model's input size — the
  idiomatic path (XLA has no 224×224 window restriction)
- ``tile_parity=True``: reproduces the reference's resize-to-448×224 + two
  224×224 tiles pipeline (src/yolact.rs:207-217), with both tiles in one
  batched device pass instead of two sequential invokes
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.core.config import PipelineConfig
from tod_tpu.ops.cc_labels import connected_components
from tod_tpu.ops.packing import pack_class_id, unpack_rgb_u32
from tod_tpu.ops.postprocess import semantic_argmax, upsample_nearest
from tod_tpu.ops.preprocess import (
    normalize,
    preprocess_frame,
    resize_triangle,
    upscale_to_frame,
)


class Classifier:
    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        params: Any = None,
        tile_parity: bool = False,
        seed: int = 0,
    ):
        from tod_tpu.models.yolact import create_model

        self.cfg = cfg or PipelineConfig()
        self.tile_parity = tile_parity
        mcfg = self.cfg.model
        if tile_parity and mcfg.input_size != (224, 224):
            import dataclasses

            mcfg = dataclasses.replace(mcfg, input_size=(224, 224))
        self.model, _ = create_model(mcfg)
        if params is None:
            x0 = jnp.zeros((1, *mcfg.input_size, 3), jnp.bfloat16)
            params = jax.jit(lambda k: self.model.init(k, x0, train=False))(
                jax.random.PRNGKey(seed)
            )
        else:
            # restored checkpoints are host numpy trees; pin them to the
            # device once or every classify() re-uploads the full model
            params = jax.device_put(params)
        self.params = params
        cam_hw = (self.cfg.camera.height, self.cfg.camera.width)
        model = self.model
        max_balls = self.cfg.geometry.max_balls
        meaningful = mcfg.meaningful_classes

        if tile_parity:

            def _classify(p, words):
                rgb = unpack_rgb_u32(words)
                small = resize_triangle(rgb, (224, 448))
                tiles = jnp.stack([small[:, :224], small[:, 224:]], axis=0)
                x = normalize(tiles, jnp.dtype(mcfg.dtype))
                out = model.apply(p, x, train=False)
                # per-tile semantic path at 28×28, ids per tile
                # (the reference flood-fills per tile, src/yolact.rs:120)
                cls = semantic_argmax(out.sem_logits, meaningful)  # (2, 28, 28)
                ids0 = connected_components(cls[0] == 3, max_labels=max_balls)
                ids1 = connected_components(cls[1] == 3, max_labels=max_balls)
                cls_up = upsample_nearest(cls, 8)  # (2, 224, 224)
                ids_up = upsample_nearest(jnp.stack([ids0, ids1]), 8)
                cls_st = jnp.concatenate([cls_up[0], cls_up[1]], axis=1)
                ids_st = jnp.concatenate([ids_up[0], ids_up[1]], axis=1)
                cls_full = upscale_to_frame(cls_st, cam_hw)
                ids_full = upscale_to_frame(ids_st, cam_hw)
                return pack_class_id(cls_full, ids_full)

        else:

            def _classify(p, words):
                rgb = unpack_rgb_u32(words)
                x = preprocess_frame(rgb, mcfg.input_size, jnp.dtype(mcfg.dtype))
                out = model.apply(p, x, train=False)
                cls_small = semantic_argmax(out.sem_logits[0], meaningful)
                cls_in = upsample_nearest(cls_small, 8)
                cls_full = upscale_to_frame(cls_in, cam_hw)
                ids = connected_components(cls_full == 3, max_labels=max_balls)
                return pack_class_id(cls_full, ids)

        self._classify = jax.jit(_classify)

    def classify(self, frame_words: np.ndarray) -> np.ndarray:
        """(H, W) or flat (H*W,) uint32 packed frame → same-shape packed
        class/id words (in-place semantics of the reference, returned)."""
        h, w = self.cfg.camera.height, self.cfg.camera.width
        words = jnp.asarray(np.asarray(frame_words, np.uint32).reshape(h, w))
        out = np.asarray(self._classify(self.params, words))
        return out.reshape(np.asarray(frame_words).shape)
