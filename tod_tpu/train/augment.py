"""Training-time data augmentation.

A contract-level wrapper: ``Augmented(source)`` has the same ``next_batch()``
surface as ``SyntheticDetectionData`` / ``DiskDetectionData`` and applies
label-consistent transforms per sample on the host (numpy, before staging —
the device graph stays static):

- horizontal flip (p=0.5): image, instance masks and the semantic target
  mirror on the W axis; boxes remap ``[y1, x1, y2, x2] → [y1, 1-x2, y2,
  1-x1]`` (normalized coordinates).
- photometric jitter: brightness (multiplicative) and contrast (about the
  per-image mean), both label-free.

Geometry-preserving-only on purpose: scale/crop augmentation would also
have to rewrite the depth channel the serving pipeline fuses against
(geometry/fusion.py), which is a modeling decision, not a default.

Seeded independently of the wrapped source, so the same underlying scene
stream can be replayed with different augmentation draws.

:func:`device_augment` is the TPU-side counterpart: the same transform family
(hflip + photometric) expressed in jnp and applied INSIDE the jitted train
step (trainer.make_train_step, ``TrainConfig.device_augment``).  On this
single-core host that is the difference between augmentation costing ~3 ms of
host time per scene (data-bound training) and costing nothing — flips are
layout ops and the photometric math fuses into the input normalization on
device.  Keyed on the step counter, so chunked-scan dispatch replays the
exact per-step draws of the serial loop.
"""

from __future__ import annotations

import numpy as np


class Augmented:
    def __init__(
        self,
        data,
        seed: int = 0,
        hflip: bool = True,
        brightness: float = 0.15,
        contrast: float = 0.15,
    ):
        self.data = data
        self.rng = np.random.default_rng(seed)
        self.hflip = hflip
        self.brightness = brightness
        self.contrast = contrast

    def next_batch(self) -> dict:
        b = {k: np.array(v, copy=True) for k, v in self.data.next_batch().items()}
        n = b["image"].shape[0]
        for i in range(n):
            if self.hflip and self.rng.random() < 0.5:
                self._flip(b, i)
            img = b["image"][i].astype(np.float32)
            if self.brightness:
                img = img * (1.0 + self.rng.uniform(-self.brightness, self.brightness))
            if self.contrast:
                m = img.mean()
                img = (img - m) * (
                    1.0 + self.rng.uniform(-self.contrast, self.contrast)
                ) + m
            b["image"][i] = np.clip(img, 0, 255).astype(b["image"].dtype)
        return b

    @staticmethod
    def _flip(b: dict, i: int) -> None:
        b["image"][i] = b["image"][i][:, ::-1]
        b["gt_masks"][i] = b["gt_masks"][i][:, :, ::-1]
        b["sem_target"][i] = b["sem_target"][i][:, ::-1]
        boxes = b["gt_boxes"][i]
        flipped = boxes.copy()
        flipped[:, 1] = 1.0 - boxes[:, 3]
        flipped[:, 3] = 1.0 - boxes[:, 1]
        # keep padded (invalid) rows at zero so masks/validity stay aligned
        flipped[~b["gt_valid"][i]] = 0.0
        b["gt_boxes"][i] = flipped


def device_augment(key, batch: dict, noise_max: float = 7.0) -> dict:
    """Label-consistent augmentation as traced device ops (jit-safe).

    Per sample: horizontal flip (p=0.5; image, masks, semantic target mirror
    on W; normalized boxes remap ``x → 1-x`` on valid rows), then white-balance
    × brightness × gamma jitter and gaussian sensor noise on the image.
    Returns a new batch dict with ``image`` as float32 in [0, 255] (the train
    step normalizes right after).  All draws come from ``key`` — fold in the
    step counter for a deterministic per-step stream.
    """
    import jax
    import jax.numpy as jnp

    kf, kwb, kb, kg, ks, kn = jax.random.split(key, 6)
    img = batch["image"].astype(jnp.float32)  # (B, H, W, 3)
    b = img.shape[0]
    flip = jax.random.bernoulli(kf, 0.5, (b,))

    img = jnp.where(flip[:, None, None, None], img[:, :, ::-1], img)
    masks = batch["gt_masks"]
    masks = jnp.where(flip[:, None, None, None], masks[:, :, :, ::-1], masks)
    sem = batch["sem_target"]
    sem = jnp.where(flip[:, None, None], sem[:, :, ::-1], sem)
    boxes = batch["gt_boxes"]
    fb = jnp.stack(
        [boxes[..., 0], 1.0 - boxes[..., 3], boxes[..., 2], 1.0 - boxes[..., 1]],
        axis=-1,
    )
    fb = jnp.where(batch["gt_valid"][..., None], fb, 0.0)
    boxes = jnp.where(flip[:, None, None], fb, boxes)

    wb = jax.random.uniform(kwb, (b, 1, 1, 3), minval=0.9, maxval=1.1)
    bright = jax.random.uniform(kb, (b, 1, 1, 1), minval=0.8, maxval=1.25)
    gamma = jax.random.uniform(kg, (b, 1, 1, 1), minval=0.8, maxval=1.25)
    x = jnp.clip(img * wb * bright, 0.0, 255.0)
    x = 255.0 * (x * (1.0 / 255.0)) ** gamma
    sigma = jax.random.uniform(ks, (b, 1, 1, 1), maxval=noise_max)
    x = x + sigma * jax.random.normal(kn, img.shape)
    x = jnp.clip(x, 0.0, 255.0)
    return {
        **batch,
        "image": x,
        "gt_boxes": boxes,
        "gt_masks": masks,
        "sem_target": sem,
    }
