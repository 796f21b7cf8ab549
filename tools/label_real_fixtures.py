"""Hand-label the reference's real photo fixtures → tests/fixtures/real/.

The reference's de-facto regression inputs are two real photographs wired in
as camera substitutes (reference src/yolact.rs:203-204): data/frc_balls.png
(blue/red/yellow game balls on a white size-reference card) and
data/red_robot.png (FRC team 4028's robot — red bumpers, dark mechanism
tower — in front of a crowd).  This tool produces instance labels for them in
the train/dataset.py on-disk layout, so the standard evaluator
(train/evaluate.py --data) and the golden gates (tests/test_golden.py) can
score any checkpoint against real images.

"Hand-labeled" concretely: seeded color/geometry segmentation whose every
parameter was tuned against a visual overlay of these two specific images
(they are constants of the fixtures, not a general algorithm), with the
resulting masks committed as PNGs.  Masks follow silhouette convention — the
open-frame robot is labeled as its filled outline, interior gaps included,
the way a human annotator boxes a machine.

Label summary (224×224 pixel coordinates):
- frc_balls.png: three class-3 balls — blue (large, upper left), red (large,
  right, partly occluded BY the yellow ball), yellow (small, lower left,
  printed logo included in the mask).
- red_robot.png: one class-1 (red-alliance) robot — bumper band + tower.

Rerun: ``python tools/label_real_fixtures.py`` (requires the reference mount
and scipy; the committed outputs make both optional for tests).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

REFERENCE = pathlib.Path("/root/reference/data")
OUT = pathlib.Path(__file__).resolve().parents[1] / "tests/fixtures/real"


def _largest_cc(m: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    lab, n = ndimage.label(m)
    if n == 0:
        return m
    sizes = ndimage.sum(m, lab, range(1, n + 1))
    return lab == (1 + int(np.argmax(sizes)))


def label_balls(img: np.ndarray) -> list[tuple[int, np.ndarray]]:
    """frc_balls.png → three (class, mask) instances."""
    from scipy import ndimage

    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    blue = _largest_cc((b > r + 30) & (b > g + 20) & (b > 80))
    red = _largest_cc((r > g + 40) & (r > b + 40) & (r > 90))
    yellow = _largest_cc((r > 120) & (g > 100) & (b < g - 50) & (b < 140))
    blue, red, yellow = (ndimage.binary_fill_holes(m) for m in (blue, red, yellow))
    # occlusion order (visible-mask convention, same as the generators):
    # the yellow ball sits in FRONT of the red one — overlap goes to yellow.
    red &= ~yellow
    return [(3, blue), (3, red), (3, yellow)]


def label_robot(img: np.ndarray) -> list[tuple[int, np.ndarray]]:
    """red_robot.png → one (class, mask) instance (red alliance = class 1)."""
    from scipy import ndimage

    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    red = (r > g + 45) & (r > b + 45) & (r > 100)
    bumper = _largest_cc(red)
    ys, _ = np.nonzero(bumper)
    ytop = ys.min()
    # the mechanism is the dark tower above the bumper; the window narrows
    # toward the top (robots taper, crowds don't) around the tower center
    # x=108, and only dark pixels CONNECTED to the bumper count (crowd
    # shadows that merely look dark stay out).
    dark = img.max(-1) < 88
    win = np.zeros_like(dark)
    for y in range(0, ytop + 20):
        t = y / max(ytop, 1)
        half = 22 + 48 * t
        win[y, max(int(108 - half), 0) : int(108 + half)] = True
    cand = bumper | (dark & win)
    lab, _ = ndimage.label(cand)
    keep = np.unique(lab[bumper])
    keep = keep[keep > 0]
    robot = np.isin(lab, keep)
    robot = ndimage.binary_fill_holes(
        ndimage.binary_closing(robot, np.ones((5, 5)))
    )
    return [(1, robot)]


def main() -> int:
    from tod_tpu.utils.image_io import load_image, save_rgb

    (OUT / "masks").mkdir(parents=True, exist_ok=True)
    records = []
    for fname, labeler in (
        ("frc_balls.png", label_balls),
        ("red_robot.png", label_robot),
    ):
        img = load_image(REFERENCE / fname).astype(np.float32)
        h, w = img.shape[:2]
        objects = []
        stem = fname.rsplit(".", 1)[0]
        for k, (cls, mask) in enumerate(labeler(img)):
            ys, xs = np.nonzero(mask)
            mname = f"masks/{stem}_{k}.png"
            save_rgb(
                OUT / mname,
                np.repeat(mask.astype(np.uint8)[..., None] * 255, 3, axis=-1),
            )
            objects.append(
                {
                    "bbox": [
                        float(ys.min()),
                        float(xs.min()),
                        float(ys.max() + 1),
                        float(xs.max() + 1),
                    ],
                    "class": int(cls),
                    "mask": mname,
                }
            )
        # image path is absolute into the read-only reference mount — the
        # photos are not ours to copy; tests skip when the mount is absent
        records.append({"file": str(REFERENCE / fname), "objects": objects})
        print(f"{fname}: {len(objects)} instances")
    (OUT / "annotations.json").write_text(json.dumps({"images": records}, indent=1))
    print(f"wrote {OUT}/annotations.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
