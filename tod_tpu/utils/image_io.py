"""Image IO helpers, including the reference's debug-artifact formats.

The reference's only regression tooling was BMP dumps eyeballed by the author
(map.bmp / depth.bmp / connections0.bmp — src/scene.rs:290-310, SURVEY.md §4);
we keep the same artifact shapes available for debugging and goldens, plus
general PNG load/save.
"""

from __future__ import annotations

import pathlib

import numpy as np


def load_image(path) -> np.ndarray:
    """PNG/BMP → (H, W, 3) uint8."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def save_rgb(path, rgb: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(rgb, np.uint8)).save(path)


def save_gray_bmp(path, values: np.ndarray) -> None:
    """Float/int map → 8-bit grayscale BMP, the reference's debug dump format
    (truncating cast like `*i as u8`, src/scene.rs:291)."""
    from PIL import Image

    arr = (np.asarray(values).astype(np.int64) & 0xFF).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


def dump_scene_debug(scene, out_dir=".", depth=None) -> list[str]:
    """Write map.bmp / connections0.bmp / connections1.bmp (and depth.bmp if a
    depth frame is given, scaled /17 like src/scene.rs:192) — the reference's
    append_scene debug block (src/scene.rs:191-194,290-310).  Returns paths."""
    out = pathlib.Path(out_dir)
    height = np.asarray(scene.height)
    conns = np.asarray(scene.connections)
    paths = []
    if depth is not None:
        save_gray_bmp(out / "depth.bmp", np.asarray(depth) // 17)
        paths.append(str(out / "depth.bmp"))
    save_gray_bmp(out / "map.bmp", height)
    paths.append(str(out / "map.bmp"))
    # connections0 = first 4 planes' first component analog; we dump the mean
    # of each half (the reference dumped the raw RGBA32F first channel)
    save_gray_bmp(out / "connections0.bmp", np.nan_to_num(conns[..., 0]))
    paths.append(str(out / "connections0.bmp"))
    save_gray_bmp(out / "connections1.bmp", np.nan_to_num(conns[..., 4]))
    paths.append(str(out / "connections1.bmp"))
    return paths
