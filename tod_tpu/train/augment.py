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
