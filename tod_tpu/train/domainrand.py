"""Domain-randomized FRC-scene generator — the sim-to-real training data.

The plain procedural dataset (train/synthetic_data.py) draws small flat-yellow
balls and solid red/blue boxes on one green floor ramp; a model trained on it
memorizes that distribution and detects nothing in a real photograph — the
exact failure the reference's author reported for their own training
(reference README.md:8).  The reference's de-facto regression inputs are real
photos (data/frc_balls.png: blue/red/yellow balls on white; data/red_robot.png:
a real FRC robot, red bumpers, cluttered crowd background — wired in as camera
substitutes at src/yolact.rs:203-204).

This generator randomizes everything that is *not* the class definition, so
the only stable signal left to learn is the one that transfers:

- **ball** (class 3) = a circular object of a saturated game-piece color
  (yellow / red / blue / orange), at any scale from a distant ball to a
  near-camera closeup (the fixture balls span ~half the frame), with 3-D
  shading (lambertian + specular from a random light), seam arcs, and
  mutual occlusion — or occasionally the legacy flat disc.
- **robot** (class 1 red / 2 blue) = a dark cluttered mechanism body over a
  saturated **bumper band** with white number patches (FRC robots are
  identified by bumper color; the body is arbitrary machinery) — or
  occasionally the legacy solid box.
- **background** = anything: the legacy floor ramp, flat near-white (the
  frc_balls look), directional gradients, low-frequency texture, or crowd
  clutter (muted random rectangles/ellipses, e.g. spectators and banners —
  labeled background, never robot).
- **photometrics** = global gamma / brightness / white-balance jitter,
  optional blur, sensor noise.

Same contract as :class:`~tod_tpu.train.synthetic_data.SyntheticDetectionData`
(``next_batch()`` / ``_scene()``), so it drops into the Trainer, the disk
exporter, and the evaluator unchanged.  All drawing is windowed numpy (objects
render into their bounding box only) — the host is a single core here and the
generator must outrun the TPU train step.
"""

from __future__ import annotations

import numpy as np

from tod_tpu.train.synthetic_data import (
    BALL,
    BLUE_ROBOT,
    MAX_OBJECTS,
    RED_ROBOT,
    SyntheticDetectionData,
)

# Saturated game-piece palette (fixture balls are blue/red/yellow; orange is
# the adjacent FRC game era). Values are RGB float32.
BALL_PALETTE = np.array(
    [
        [235, 215, 40],  # yellow (legacy + the fixture's ~7in ball)
        [205, 45, 40],  # red
        [45, 90, 205],  # blue
        [235, 120, 35],  # orange
    ],
    np.float32,
)
BUMPER_RED = np.array([205, 40, 40], np.float32)
BUMPER_BLUE = np.array([40, 60, 205], np.float32)

MIN_VISIBLE_PX = 30  # objects occluded below this vanish from the labels


def _rand_color(rng, lo=0, hi=255):
    return rng.uniform(lo, hi, 3).astype(np.float32)


BUMPER_RED.setflags(write=False)
BUMPER_BLUE.setflags(write=False)


def _muted(rng):
    """A desaturated random color (crowd/pit clutter — never ball-saturated)."""
    c = rng.uniform(0, 255, 3).astype(np.float32)
    g = c.mean()
    return g + (c - g) * rng.uniform(0.0, 0.45)


def _box_blur3(img: np.ndarray) -> np.ndarray:
    """3×3 box blur, edge-clamped (separable, pure numpy)."""
    p = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h = p[:, :-2] + p[:, 1:-1] + p[:, 2:]
    return (h[:-2] + h[1:-1] + h[2:]) / 9.0


class DomainRandomizedData(SyntheticDetectionData):
    """Drop-in domain-randomized variant of the procedural dataset.

    ``legacy_prob`` controls how often a scene is drawn in the plain
    procedural style (flat discs / solid boxes on the floor ramp) so the
    legacy held-out gates (tests/test_golden.py, seed-9999 scenes) stay
    in-distribution while the bulk of training covers the randomized domain.
    """

    def __init__(self, *args, legacy_prob: float = 0.2, **kw):
        super().__init__(*args, **kw)
        self.legacy_prob = legacy_prob

    # ------------------------------------------------------------- scene --
    def _scene(self):
        if self.rng.random() < self.legacy_prob:
            return super()._scene()
        h, w = self.h, self.w
        rng = self.rng

        img = self._background(rng, h, w)

        inst_mask = np.zeros((MAX_OBJECTS, h, w), np.float32)
        boxes = np.zeros((MAX_OBJECTS, 4), np.float32)
        classes = np.zeros((MAX_OBJECTS,), np.int32)
        sem = np.zeros((h, w), np.int32)

        n_balls = int(rng.integers(0, 5))
        n_robots = int(rng.integers(0, 3))
        if n_balls + n_robots == 0:
            n_balls = 1
        kinds = [BALL] * n_balls + [
            int(rng.choice([RED_ROBOT, BLUE_ROBOT])) for _ in range(n_robots)
        ]
        rng.shuffle(kinds)
        kinds = kinds[:MAX_OBJECTS]

        # painter's order: each object may occlude everything drawn before it
        # (the fixture's yellow ball sits on the blue one); earlier objects'
        # visible masks lose the covered pixels.
        k = 0
        for kind in kinds:
            if kind == BALL:
                m = self._draw_ball(rng, img)
            else:
                m = self._draw_robot(rng, img, kind)
            if m is None:
                continue
            inst_mask[:k][:, m] = 0.0  # occlusion: newer object wins
            inst_mask[k] = m.astype(np.float32)
            classes[k] = kind
            k += 1

        # labels from the final VISIBLE masks (boxes are visible extents)
        valid = np.zeros((MAX_OBJECTS,), bool)
        for j in range(k):
            m = inst_mask[j] > 0
            if m.sum() < MIN_VISIBLE_PX:
                inst_mask[j] = 0.0
                continue
            ys, xs = np.nonzero(m)
            boxes[j] = [
                ys.min() / h,
                xs.min() / w,
                (ys.max() + 1) / h,
                (xs.max() + 1) / w,
            ]
            valid[j] = True
            sem[m] = classes[j]

        img = self._photometric(rng, img)
        return img, boxes, classes, valid, inst_mask, sem

    # -------------------------------------------------------- background --
    def _background(self, rng, h, w) -> np.ndarray:
        mode = rng.choice(["ramp", "flat", "gradient", "texture", "clutter"])
        if mode == "ramp":  # legacy floor look, base colors jittered
            ramp = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
            base = _rand_color(rng, 10, 90)
            gain = _rand_color(rng, 20, 110)
            img = base + gain * ramp * np.ones((1, w, 1), np.float32)
        elif mode == "flat":
            # biased bright: the frc_balls fixture is near-white
            v = rng.uniform(120, 255) if rng.random() < 0.6 else rng.uniform(20, 255)
            img = np.full((h, w, 3), v, np.float32) + rng.uniform(-18, 18, 3).astype(
                np.float32
            )
        elif mode == "gradient":
            c0, c1 = _rand_color(rng), _rand_color(rng)
            ang = rng.uniform(0, 2 * np.pi)
            yy = np.linspace(-0.5, 0.5, h, dtype=np.float32)[:, None]
            xx = np.linspace(-0.5, 0.5, w, dtype=np.float32)[None, :]
            t = (yy * np.sin(ang) + xx * np.cos(ang) + 0.5)[..., None]
            img = c0 + (c1 - c0) * np.clip(t, 0, 1)
        elif mode == "texture":
            # low-frequency noise field: tiny random image, bilinear-ish upsample
            gh, gw = int(rng.integers(3, 9)), int(rng.integers(3, 12))
            grid = rng.uniform(0, 255, (gh, gw, 3)).astype(np.float32)
            img = _upsample_bilinear(grid, h, w)
        else:  # clutter: gradient base + muted rectangles/ellipses (crowd)
            img = self._background_simple(rng, h, w)
            for _ in range(int(rng.integers(3, 11))):
                self._draw_clutter(rng, img)
        # optional wall/floor split (red_robot.png: busy wall over a flat floor)
        if mode != "clutter" and rng.random() < 0.3:
            split = int(rng.uniform(0.3, 0.75) * h)
            floor = np.full((h - split, w, 3), rng.uniform(40, 200), np.float32)
            floor += rng.uniform(-15, 15, 3).astype(np.float32)
            img[split:] = floor
        return img

    def _background_simple(self, rng, h, w) -> np.ndarray:
        c0, c1 = _rand_color(rng), _rand_color(rng)
        t = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
        return c0 + (c1 - c0) * t * np.ones((1, w, 1), np.float32)

    def _draw_clutter(self, rng, img) -> None:
        """Background clutter: muted rect or ellipse (spectators, banners,
        pit walls — plain colored shapes are NOT robots; only a bumper band
        under a dark body is)."""
        h, w = img.shape[:2]
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        hh, hw2 = rng.uniform(0.03, 0.25) * h, rng.uniform(0.03, 0.25) * w
        y0, y1 = int(max(cy - hh, 0)), int(min(cy + hh, h))
        x0, x1 = int(max(cx - hw2, 0)), int(min(cx + hw2, w))
        if y1 <= y0 or x1 <= x0:
            return
        color = _muted(rng)
        if rng.random() < 0.5:
            img[y0:y1, x0:x1] = color
        else:
            yy = np.arange(y0, y1, dtype=np.float32)[:, None]
            xx = np.arange(x0, x1, dtype=np.float32)[None, :]
            m = ((yy - cy) / max(hh, 1)) ** 2 + ((xx - cx) / max(hw2, 1)) ** 2 <= 1.0
            img[y0:y1, x0:x1][m] = color

    # ------------------------------------------------------------- balls --
    def _draw_ball(self, rng, img) -> np.ndarray | None:
        """Shaded sphere with optional seams/specular; returns full-frame mask."""
        h, w = img.shape[:2]
        r = rng.uniform(0.04, 0.32) * min(h, w)
        cy = rng.uniform(0.08, 0.92) * h
        cx = rng.uniform(0.08, 0.92) * w
        y0, y1 = int(max(cy - r, 0)), int(min(cy + r + 1, h))
        x0, x1 = int(max(cx - r, 0)), int(min(cx + r + 1, w))
        if y1 <= y0 or x1 <= x0:
            return None
        yy = np.arange(y0, y1, dtype=np.float32)[:, None] - cy
        xx = np.arange(x0, x1, dtype=np.float32)[None, :] - cx
        d2 = yy * yy + xx * xx
        m = d2 <= r * r
        if not m.any():
            return None
        base = BALL_PALETTE[rng.integers(0, len(BALL_PALETTE))] + rng.uniform(
            -25, 25, 3
        ).astype(np.float32)

        if rng.random() < 0.15:  # legacy flat disc
            shade = np.ones_like(d2)[..., None]
        else:
            # lambertian shading from a random light direction
            nz = np.sqrt(np.maximum(1.0 - d2 / (r * r), 0.0))
            lv = rng.normal(size=3)
            lv[2] = abs(lv[2]) + 0.5
            lv /= np.linalg.norm(lv)
            ndotl = np.maximum(
                (xx / r) * lv[0] + (yy / r) * lv[1] + nz * lv[2], 0.0
            )
            ambient = rng.uniform(0.35, 0.65)
            shade = (ambient + (1.05 - ambient) * ndotl)[..., None]

        patch = img[y0:y1, x0:x1]
        col = base[None, None, :] * shade
        # specular highlight
        if rng.random() < 0.6:
            hy, hx = rng.uniform(-0.5, 0.2) * r, rng.uniform(-0.5, 0.5) * r
            hd2 = (yy - hy) ** 2 + (xx - hx) ** 2
            col = col + rng.uniform(40, 120) * np.exp(-hd2 / (0.12 * r * r))[..., None]
        # seam arcs (tennis/FRC ball mold lines)
        for _ in range(int(rng.integers(0, 3))):
            sy, sx = rng.uniform(-0.7, 0.7, 2) * r
            r2 = rng.uniform(0.55, 1.15) * r
            ring = np.abs(np.sqrt((yy - sy) ** 2 + (xx - sx) ** 2) - r2) < max(
                0.04 * r, 1.0
            )
            col = np.where(ring[..., None], col * rng.uniform(0.65, 0.85), col)
        patch[m] = col[m]
        mask = np.zeros((h, w), bool)
        mask[y0:y1, x0:x1] = m
        return mask

    # ------------------------------------------------------------ robots --
    def _draw_robot(self, rng, img, kind: int) -> np.ndarray | None:
        """Dark mechanism body over a saturated bumper band (or legacy box)."""
        h, w = img.shape[:2]
        bw = rng.uniform(0.12, 0.55) * w  # body half-width
        bh = rng.uniform(0.12, 0.55) * h  # body half-height
        cy = rng.uniform(0.15, 0.9) * h
        cx = rng.uniform(0.1, 0.9) * w
        bumper = BUMPER_RED if kind == RED_ROBOT else BUMPER_BLUE
        bumper = bumper + rng.uniform(-20, 20, 3).astype(np.float32)

        mask = np.zeros((h, w), bool)
        if rng.random() < 0.2:  # legacy solid box
            y0, y1 = int(max(cy - bh, 0)), int(min(cy + bh, h))
            x0, x1 = int(max(cx - bw, 0)), int(min(cx + bw, w))
            if y1 <= y0 or x1 <= x0:
                return None
            img[y0:y1, x0:x1] = bumper
            mask[y0:y1, x0:x1] = True
            return mask

        # body: dark textured machinery
        y0, y1 = int(max(cy - bh, 0)), int(min(cy + bh, h))
        x0, x1 = int(max(cx - bw, 0)), int(min(cx + bw, w))
        if y1 <= y0 or x1 <= x0:
            return None
        body_h = y1 - y0
        base = np.float32(rng.uniform(25, 80))
        body = base + rng.standard_normal(
            (body_h, x1 - x0, 3), dtype=np.float32
        ) * np.float32(12)
        # mechanism clutter: small rects of metal grays / dark parts / a few
        # bright bits (wires, logos)
        for _ in range(int(rng.integers(2, 7))):
            ph = int(rng.uniform(0.08, 0.5) * body_h)
            pw = int(rng.uniform(0.08, 0.5) * (x1 - x0))
            py = int(rng.uniform(0, max(body_h - ph, 1)))
            px = int(rng.uniform(0, max(x1 - x0 - pw, 1)))
            if rng.random() < 0.7:
                c = np.full(3, rng.uniform(15, 150), np.float32) + rng.uniform(-12, 12, 3)
            else:
                c = _muted(rng)
            body[py : py + ph, px : px + pw] = c
        img[y0:y1, x0:x1] = body
        mask[y0:y1, x0:x1] = True

        # bumper band: bottom of the body, slightly wider, saturated team color
        band_h = rng.uniform(0.15, 0.38) * 2 * bh
        ext = rng.uniform(1.0, 1.15)
        by0 = int(max(cy + bh - band_h, 0))
        by1 = int(min(cy + bh, h))
        bx0 = int(max(cx - bw * ext, 0))
        bx1 = int(min(cx + bw * ext, w))
        if by1 > by0 and bx1 > bx0:
            band = np.broadcast_to(bumper, (by1 - by0, bx1 - bx0, 3)).astype(
                np.float32
            )
            band += rng.standard_normal(band.shape, dtype=np.float32) * np.float32(6)
            # white team-number patches
            for _ in range(int(rng.integers(1, 4))):
                ph = max(int((by1 - by0) * rng.uniform(0.3, 0.7)), 1)
                pw = max(int((bx1 - bx0) * rng.uniform(0.04, 0.12)), 1)
                py = int(rng.uniform(0, max(by1 - by0 - ph, 1)))
                px = int(rng.uniform(0, max(bx1 - bx0 - pw, 1)))
                band[py : py + ph, px : px + pw] = rng.uniform(215, 255)
            img[by0:by1, bx0:bx1] = band
            mask[by0:by1, bx0:bx1] = True
        return mask

    # -------------------------------------------------------- photometric --
    def _photometric(self, rng, img) -> np.ndarray:
        """Global white balance + brightness + gamma (as one per-channel u8
        LUT — the host is a single core, full-frame pow/float64 math was the
        generator's hot spot), then optional blur and sensor noise."""
        img = np.clip(img, 0, 255).astype(np.uint8)
        wb = rng.uniform(0.9, 1.1, 3) * rng.uniform(0.75, 1.25)
        gamma = rng.uniform(0.8, 1.25)
        v = np.arange(256, dtype=np.float32)[:, None] * wb[None, :]
        lut = (255.0 * np.clip(v / 255.0, 0, 1) ** gamma).astype(np.float32)
        out = lut[img, np.arange(3)]  # (H, W, 3) f32 via per-channel LUT
        if rng.random() < 0.4:
            out = _box_blur3(out)
            if rng.random() < 0.3:
                out = _box_blur3(out)
        sigma = np.float32(rng.uniform(2.0, 9.0))
        out += rng.standard_normal(out.shape, dtype=np.float32) * sigma
        return np.clip(out, 0, 255).astype(np.uint8)


def _upsample_bilinear(grid: np.ndarray, h: int, w: int) -> np.ndarray:
    """(gh, gw, 3) → (h, w, 3) bilinear, pure numpy."""
    gh, gw = grid.shape[:2]
    y = np.linspace(0, gh - 1, h, dtype=np.float32)
    x = np.linspace(0, gw - 1, w, dtype=np.float32)
    y0 = np.floor(y).astype(np.int32)
    x0 = np.floor(x).astype(np.int32)
    y1 = np.minimum(y0 + 1, gh - 1)
    x1 = np.minimum(x0 + 1, gw - 1)
    fy = (y - y0)[:, None, None]
    fx = (x - x0)[None, :, None]
    a = grid[y0][:, x0]
    b = grid[y0][:, x1]
    c = grid[y1][:, x0]
    d = grid[y1][:, x1]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx
