"""Unit tests for the ops layer against NumPy oracles (SURVEY.md §4 test plan)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.ops import (
    class_id_to_u16,
    connected_components,
    fast_nms,
    pack_class_id,
    pack_rgb_u32,
    semantic_argmax,
    semantic_postprocess,
    unpack_class_id,
    unpack_rgb_u32,
    upsample_nearest,
)
from tod_tpu.ops.nms import greedy_nms_reference
from tod_tpu.ops.packing import u16_to_class_id
from tod_tpu.ops.masks import assemble_masks, crop_masks
from tod_tpu.ops.anchors import box_iou


class TestPacking:
    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        words = pack_rgb_u32(jnp.asarray(rgb))
        # reference layout: r<<24 | g<<16 | b<<8 (src/scene.rs:86)
        expect = (
            (rgb[..., 0].astype(np.uint32) << 24)
            | (rgb[..., 1].astype(np.uint32) << 16)
            | (rgb[..., 2].astype(np.uint32) << 8)
        )
        np.testing.assert_array_equal(np.asarray(words), expect)
        back = unpack_rgb_u32(words)
        np.testing.assert_array_equal(np.asarray(back), rgb)

    def test_class_id_packing_uses_or_not_and(self):
        # the reference's & bug zeroes everything (SURVEY.md §3.6); intent is |
        cls = jnp.array([[3]], dtype=jnp.uint8)
        ids = jnp.array([[2]], dtype=jnp.int32)
        word = int(np.asarray(pack_class_id(cls, ids))[0, 0])
        assert word == (3 << 24) | (2 << 16)
        c, i = unpack_class_id(jnp.array([[word]], dtype=jnp.uint32))
        assert int(np.asarray(c)) == 3 and int(np.asarray(i)) == 2

    def test_no_instance_id_roundtrip(self):
        cls = jnp.array([[0]], dtype=jnp.uint8)
        ids = jnp.array([[-1]], dtype=jnp.int32)
        _, i = unpack_class_id(pack_class_id(cls, ids))
        assert int(np.asarray(i)) == -1

    def test_u16_roundtrip(self):
        cls = jnp.array([[1, 2], [3, 0]], dtype=jnp.uint8)
        ids = jnp.array([[5, -1], [0, -1]], dtype=jnp.int32)
        c, i = u16_to_class_id(class_id_to_u16(cls, ids))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(cls))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ids))


class TestSemantic:
    def test_argmax_classes(self):
        # channel 0 bg, 1 red robot, 2 blue robot, 3 ball (src/yolact.rs:98-101)
        logits = np.zeros((2, 2, 81), np.float32)
        logits[0, 0, 3] = 5.0  # ball
        logits[0, 1, 1] = 2.0  # red robot
        logits[1, 0, 2] = 1.0  # blue robot
        # [1,1] all zero → bg (argmax ties → 0)
        cls = np.asarray(semantic_argmax(jnp.asarray(logits)))
        np.testing.assert_array_equal(cls, [[3, 1], [2, 0]])

    def test_upsample_nearest(self):
        x = jnp.array([[1, 2], [3, 4]], dtype=jnp.uint8)
        up = np.asarray(upsample_nearest(x, 2))
        np.testing.assert_array_equal(
            up, [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]
        )

    def test_postprocess_shapes(self):
        logits = np.random.default_rng(1).normal(size=(28, 28, 81)).astype(np.float32)
        cls, ids, packed = semantic_postprocess(jnp.asarray(logits))
        assert cls.shape == (224, 224)
        assert ids.shape == (224, 224)
        assert packed.shape == (224, 224)
        assert packed.dtype == jnp.uint32


def _cc_oracle(mask):
    """BFS flood-fill oracle mirroring src/yolact.rs:52-88 semantics."""
    h, w = mask.shape
    out = np.full((h, w), -1, np.int32)
    nid = 0
    for sy in range(h):
        for sx in range(w):
            if mask[sy, sx] and out[sy, sx] == -1:
                stack = [(sy, sx)]
                out[sy, sx] = nid
                while stack:
                    y, x = stack.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and out[ny, nx] == -1:
                            out[ny, nx] = nid
                            stack.append((ny, nx))
                nid += 1
    return out


class TestConnectedComponents:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_vs_oracle(self, seed):
        rng = np.random.default_rng(seed)
        mask = rng.random((28, 28)) < 0.35
        got = np.asarray(connected_components(jnp.asarray(mask), max_labels=1024))
        np.testing.assert_array_equal(got, _cc_oracle(mask))

    def test_max_labels_clamp(self):
        # ids past max_labels-1 are clamped (ball SSBO holds 100 slots)
        mask = np.zeros((1, 9), bool)
        mask[0, ::2] = True  # 5 isolated components
        got = np.asarray(connected_components(jnp.asarray(mask), max_labels=3))
        assert got[0, ::2].tolist() == [0, 1, 2, 2, 2]

    def test_two_blobs_scan_order(self):
        mask = np.zeros((8, 8), bool)
        mask[6:8, 0:2] = True  # later in scan order
        mask[0:2, 5:7] = True  # first in scan order → id 0
        got = np.asarray(connected_components(jnp.asarray(mask)))
        assert got[0, 5] == 0 and got[6, 0] == 1
        assert (got[mask] >= 0).all() and (got[~mask] == -1).all()

    def test_serpentine(self):
        # worst-case propagation distance: one snake-shaped component
        mask = np.zeros((6, 6), bool)
        mask[0, :] = True
        mask[1, -1] = True
        mask[2, :] = True
        mask[3, 0] = True
        mask[4, :] = True
        got = np.asarray(connected_components(jnp.asarray(mask)))
        assert set(np.unique(got[mask])) == {0}


class TestFastNMS:
    def test_suppresses_overlaps(self):
        # 3 heavily overlapping boxes + 1 distant box, single fg class
        boxes = jnp.array(
            [
                [0.10, 0.10, 0.50, 0.50],
                [0.11, 0.11, 0.51, 0.51],
                [0.12, 0.12, 0.52, 0.52],
                [0.70, 0.70, 0.90, 0.90],
            ],
            dtype=jnp.float32,
        )
        scores = np.zeros((4, 2), np.float32)
        scores[:, 1] = [0.9, 0.8, 0.7, 0.6]
        ob, os_, oc, oi, valid = fast_nms(
            boxes, jnp.asarray(scores), iou_threshold=0.5, top_k=4, max_detections=4
        )
        kept = np.asarray(oi)[np.asarray(valid)]
        expect = greedy_nms_reference(np.asarray(boxes), scores[:, 1], 0.5)
        assert set(kept.tolist()) == set(expect) == {0, 3}

    def test_keeps_separate_classes(self):
        boxes = jnp.array(
            [[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]], dtype=jnp.float32
        )
        scores = np.zeros((2, 3), np.float32)
        scores[0, 1] = 0.9  # class 1
        scores[1, 2] = 0.8  # class 2 — same box, different class: both kept
        _, _, oc, _, valid = fast_nms(
            boxes, jnp.asarray(scores), top_k=2, max_detections=4
        )
        kept_cls = sorted(np.asarray(oc)[np.asarray(valid)].tolist())
        assert kept_cls == [1, 2]


class TestMasks:
    def test_assembly_matches_numpy(self):
        rng = np.random.default_rng(3)
        protos = rng.normal(size=(32, 40, 8)).astype(np.float32)
        coeffs = rng.normal(size=(5, 8)).astype(np.float32)
        got = np.asarray(assemble_masks(jnp.asarray(protos), jnp.asarray(coeffs)))
        expect = 1.0 / (1.0 + np.exp(-np.einsum("hwk,nk->nhw", protos, coeffs)))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_crop_zeroes_outside(self):
        masks = jnp.ones((1, 10, 10), jnp.float32)
        boxes = jnp.array([[0.2, 0.2, 0.8, 0.8]], jnp.float32)
        out = np.asarray(crop_masks(masks, boxes))
        assert out[0, 0, 0] == 0.0 and out[0, 5, 5] == 1.0

    def test_iou(self):
        a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
        b = jnp.array([[0.0, 0.0, 0.5, 1.0], [2.0, 2.0, 3.0, 3.0]])
        iou = np.asarray(box_iou(a, b))
        np.testing.assert_allclose(iou, [[0.5, 0.0]], atol=1e-6)


class TestDepthwiseShifted:
    """ops/depthwise.py: shifted-add depthwise == lax depthwise conv."""

    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("hw", [(16, 24), (15, 21)])
    def test_matches_lax_conv_f32(self, stride, hw):
        import jax
        from tod_tpu.ops.depthwise import depthwise_conv_shifted

        rng = np.random.default_rng(7)
        c = 24
        x = jnp.asarray(rng.normal(size=(2, *hw, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x,
            k,
            window_strides=(stride, stride),
            padding="SAME",
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = depthwise_conv_shifted(x, k, stride)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_grad_matches_lax_conv(self):
        import jax
        from tod_tpu.ops.depthwise import depthwise_conv_shifted

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(1, 8, 10, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 1, 8)).astype(np.float32))

        def loss_shift(k):
            return depthwise_conv_shifted(x, k, 2).sum()

        def loss_lax(k):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding="SAME",
                feature_group_count=8,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).sum()

        ga = jax.grad(loss_shift)(k)
        gb = jax.grad(loss_lax)(k)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-5)


class TestS2DStem:
    """ops/s2d.py: space-to-depth stem == SAME-padded stride-2 3x3 conv."""

    @pytest.mark.parametrize("hw", [(16, 24), (240, 320), (12, 12)])
    def test_matches_lax_conv_f32(self, hw):
        import jax
        from tod_tpu.ops.s2d import s2d_stem_conv

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, *hw, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 32)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = s2d_stem_conv(x, k)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_grad_matches_lax_conv(self):
        import jax
        from tod_tpu.ops.s2d import s2d_stem_conv

        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(1, 8, 10, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32))

        def loss_s2d(k):
            return s2d_stem_conv(x, k).sum()

        def loss_lax(k):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).sum()

        ga = jax.grad(loss_s2d)(k)
        gb = jax.grad(loss_lax)(k)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-5)

    def test_model_flag_checkpoint_compatible(self):
        """Same params, s2d_stem on/off: identical trees, matching outputs
        (bf16-tolerance), so the flag can flip on any pinned checkpoint."""
        import dataclasses

        import jax

        from tod_tpu.core.config import ModelConfig
        from tod_tpu.models.yolact import Yolact

        mcfg = dataclasses.replace(
            ModelConfig(input_size=(48, 64)),
            fpn_channels=16, proto_channels=16, head_channels=16,
            width_mult=0.35, num_prototypes=8, nms_top_k=8, max_detections=4,
        )
        m0 = Yolact(mcfg)
        m1 = Yolact(dataclasses.replace(mcfg, s2d_stem=True))
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 48, 64, 3), jnp.float32)
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
        # identical param trees (paths AND values — same init RNG draws)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            v0["params"], v1["params"],
        )
        o0 = m0.apply(v0, x, train=False)
        o1 = m1.apply(v0, x, train=False)
        np.testing.assert_allclose(
            np.asarray(o0.prototypes, np.float32),
            np.asarray(o1.prototypes, np.float32),
            rtol=0.05, atol=0.05,  # bf16 compute: sums reassociate
        )
        np.testing.assert_allclose(
            np.asarray(o0.loc, np.float32), np.asarray(o1.loc, np.float32),
            rtol=0.05, atol=0.05,
        )
