"""Wire-parity classify tests: the two-tile legacy path and resize behavior."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig
from tod_tpu.ops.packing import pack_rgb_u32, unpack_class_id
from tod_tpu.ops.preprocess import resize_triangle, tile_448x224, stitch_tiles
from tod_tpu.runtime.classify import Classifier


class TestTileParity:
    @pytest.fixture(scope="class")
    def clf(self):
        cfg = PipelineConfig(
            camera=CameraConfig(),  # full 640×480 like the reference
            model=ModelConfig(
                input_size=(224, 224),
                fpn_channels=16,
                proto_channels=16,
                head_channels=16,
                width_mult=0.35,
                num_prototypes=8,
            ),
        )
        return Classifier(cfg, tile_parity=True)

    def test_tile_mode_shapes_and_packing(self, clf):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        words = np.asarray(pack_rgb_u32(jnp.asarray(rgb)))
        out = clf.classify(words)
        assert out.shape == (480, 640) and out.dtype == np.uint32
        cls, ids = unpack_class_id(jnp.asarray(out))
        assert int(np.asarray(cls).max()) <= 3
        # id present only where ball class
        ids_np, cls_np = np.asarray(ids), np.asarray(cls)
        assert ((ids_np >= 0) <= (cls_np == 3)).all()

    def test_tile_mode_deterministic(self, clf):
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        words = np.asarray(pack_rgb_u32(jnp.asarray(rgb)))
        np.testing.assert_array_equal(clf.classify(words), clf.classify(words))


class TestResize:
    def test_triangle_downscale_averages(self):
        # 2× downscale of a checkerboard → mid gray (tent kernel averages)
        img = np.zeros((8, 8, 1), np.float32)
        img[::2, ::2] = 255.0
        img[1::2, 1::2] = 255.0
        out = np.asarray(resize_triangle(jnp.asarray(img), (4, 4)))
        # interior exactly mid-gray; corners deviate slightly (kernel clamps
        # at the border)
        np.testing.assert_allclose(out, 127.5, atol=3.0)
        np.testing.assert_allclose(out[1:3, 1:3], 127.5, atol=1e-3)

    def test_tile_stitch_roundtrip_geometry(self):
        rng = np.random.default_rng(2)
        rgb = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        tiles = tile_448x224(jnp.asarray(rgb))
        st = stitch_tiles(tiles)
        assert st.shape == (224, 448, 3)
        # stitching undoes the crop: tile 0 is the left half
        np.testing.assert_array_equal(
            np.asarray(st[:, :224]), np.asarray(tiles[0])
        )
