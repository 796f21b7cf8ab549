"""Core data types flowing through the pipeline.

Reference equivalents:
- ``Frame``       the packed ``[u32; 640*480]`` color buffer + ``[u16; 640*480]``
                  depth buffer (src/scene.rs:78-97)
- ``Detections``  the full YOLACT outputs the reference never finished
                  (src/yolact.rs:92-94 "Not enough time"), plus the semantic
                  class/id maps it *did* produce (src/yolact.rs:90-131)
- ``Scene``       ``Scene { height, pos, balls, connections }`` (src/scene.rs:122-132)
- ``Path``        ``Path { created, directions }`` + its big-endian wire format
                  (src/path.rs:11-22)

All array members are JAX/NumPy arrays with a static leading layout so the whole
pipeline stays jit-compatible (fixed shapes, no Python control flow on values).
"""

from __future__ import annotations

import dataclasses
import struct
import time
from typing import Any

import jax
import numpy as np

Array = Any  # jax.Array or np.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    """One RGB-D camera frame.

    ``rgb``   (H, W, 3) uint8 — unpacked channels (the reference packs into u32
              big-endian ``r<<24|g<<16|b<<8`` at src/scene.rs:86; we keep channels
              separate on device and provide pack/unpack in ops.packing for wire parity)
    ``depth`` (H, W) uint16 — millimeters, as read from the depth stream
              (src/scene.rs:96-97)
    """

    rgb: Array
    depth: Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Detections:
    """YOLACT detection outputs for one frame, statically shaped at N = max_detections.

    ``boxes``   (N, 4) f32, [y1, x1, y2, x2] normalized to [0, 1]
    ``scores``  (N,) f32
    ``classes`` (N,) i32 — 0 bg, 1 red robot, 2 blue robot, 3 ball (src/yolact.rs:98-101)
    ``masks``   (N, Hm, Wm) f32 in [0,1] — assembled prototype masks
    ``valid``   (N,) bool — slots surviving score threshold + Fast-NMS
    ``class_map`` (H, W) uint8 — per-pixel semantic class (the reference's actual
                output, src/yolact.rs:108-118)
    ``id_map``    (H, W) int32 — per-pixel ball instance id, -1 where none
                (replaces the flood-fill ``terrible_id``, src/yolact.rs:52-88)
    """

    boxes: Array
    scores: Array
    classes: Array
    masks: Array
    valid: Array
    class_map: Array
    id_map: Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Fused birdseye scene (src/scene.rs:122-132).

    ``height``      (H, W) f32 — occupancy/cost height map (the R32_UINT ``map``
                    image read back at src/scene.rs:312-314)
    ``pos``         (H, W, 3) f32 — world position per pixel (the RGBA32F ``world``
                    image, src/scene.rs:316-318)
    ``balls``       (max_balls, 4) f32 — (x, y, count, 0) running-average centroids
                    (the Balls SSBO, shaders/pt_cloud.comp:16-20)
    ``connections`` (H, W, 8) f32 — Euclidean edge weights to the 8 neighbors,
                    ordered per NEIGHBOR_OFFSETS: [N, NE, E, SE, S, SW, W, NW]
                    (the reference readback concat order, src/scene.rs:324-327;
                    connections0/1 images, shaders/pt_cloud_weights.comp:12-14);
                    -1 marks off-grid edges
    """

    height: Array
    pos: Array
    balls: Array
    connections: Array

    @property
    def shape(self) -> tuple[int, int]:
        return tuple(self.height.shape)  # type: ignore[return-value]


# 8-neighbor displacement order used throughout geometry + planner.
# Index i: (dy, dx). Matches connections[..., i].
# Order reproduces the reference readback concat [connections0, connections1]
# (src/scene.rs:324-327): after the weights shader's 3-stage exchange,
# connections0 holds distances to [N, NE, E, SE] and connections1 to
# [S, SW, W, NW] (traced through shaders/pt_cloud_weights.comp:77-122).
NEIGHBOR_OFFSETS: tuple[tuple[int, int], ...] = (
    (-1, 0),  # N
    (-1, 1),  # NE
    (0, 1),  # E
    (1, 1),  # SE
    (1, 0),  # S
    (1, -1),  # SW
    (0, -1),  # W
    (-1, -1),  # NW
)


@dataclasses.dataclass
class Path:
    """Driving directions to the best ball (src/path.rs:11-22).

    ``created``     unix seconds (float; serialized as u64 seconds)
    ``directions``  list of (magnitude, rotation) f32 pairs
    ``truncated``   True if a bounded path walk (the device planner's
                    max_path_steps cap) cut the direction list short — the
                    host walk is uncapped, so this flags device/host
                    divergence instead of hiding it.  Not on the wire: the
                    serialized format is the reference-compat contract.

    Wire format (src/path.rs:17-21): 8-byte big-endian unix seconds, then for each
    direction two big-endian f32s.
    """

    created: float
    directions: list[tuple[float, float]]
    truncated: bool = False

    @classmethod
    def empty(cls) -> "Path":
        return cls(created=time.time(), directions=[])

    def serialize(self) -> bytes:
        out = struct.pack(">Q", int(self.created))
        for mag, rot in self.directions:
            out += struct.pack(">ff", float(mag), float(rot))
        return out

    @classmethod
    def deserialize(cls, data: bytes) -> "Path":
        if len(data) < 8 or (len(data) - 8) % 8:
            raise ValueError(f"malformed Path payload of {len(data)} bytes")
        (secs,) = struct.unpack_from(">Q", data, 0)
        directions = []
        for off in range(8, len(data), 8):
            mag, rot = struct.unpack_from(">ff", data, off)
            directions.append((mag, rot))
        return cls(created=float(secs), directions=directions)


def empty_scene(height: int, width: int, max_balls: int = 100) -> Scene:
    return Scene(
        height=np.zeros((height, width), np.float32),
        pos=np.zeros((height, width, 3), np.float32),
        balls=np.zeros((max_balls, 4), np.float32),
        connections=np.full((height, width, 8), -1.0, np.float32),
    )
