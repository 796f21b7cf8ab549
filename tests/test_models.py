"""Model-stack tests: shapes, anchor consistency, reference-parity output map,
and the fused Pallas mask kernel vs the jnp oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import ModelConfig
from tod_tpu.kernels.mask_assembly import assemble_crop_masks
from tod_tpu.models import create_model
from tod_tpu.models.yolact import detect
from tod_tpu.ops.masks import assemble_masks, crop_masks

TINY = ModelConfig(
    input_size=(128, 160),
    fpn_channels=32,
    proto_channels=32,
    head_channels=32,
    width_mult=0.5,
    nms_top_k=16,
    max_detections=8,
)


@pytest.fixture(scope="module")
def tiny_model():
    model, anchors = create_model(TINY)
    x = jnp.zeros((1, *TINY.input_size, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, anchors, params


class TestYolactGraph:
    def test_output_shapes(self, tiny_model):
        model, anchors, params = tiny_model
        x = jnp.zeros((1, *TINY.input_size, 3), jnp.bfloat16)
        out = model.apply(params, x, train=False)
        a = anchors.shape[0]
        assert out.loc.shape == (1, a, 4)
        assert out.conf.shape == (1, a, TINY.det_num_classes)
        assert out.coeff.shape == (1, a, TINY.num_prototypes)
        # protonet at input/4, semantic head at input/8
        assert out.prototypes.shape == (1, 32, 40, TINY.num_prototypes)
        assert out.sem_logits.shape == (1, 16, 20, TINY.num_classes)

    def test_coeff_raw_logits_tanh_after_gather(self, tiny_model):
        """outputs.coeff is RAW logits (tanh moved after the top-k gather —
        tanh∘gather == gather∘tanh, so the pinned checkpoint is unchanged);
        the detect path must produce tanh-bounded coefficients."""
        model, anchors, params = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(1), (1, *TINY.input_size, 3)).astype(
            jnp.bfloat16
        )
        out = model.apply(params, x, train=False)
        assert out.coeff.dtype == jnp.bfloat16  # compute dtype, pre-tanh
        from tod_tpu.models.yolact import _detect_sample

        dets_coeff = jnp.tanh(out.coeff[0].astype(jnp.float32))
        assert (np.asarray(dets_coeff) >= -1).all()
        assert (np.asarray(dets_coeff) <= 1).all()

    def test_detect_static_shapes(self, tiny_model):
        model, anchors, params = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(2), (1, *TINY.input_size, 3)).astype(
            jnp.bfloat16
        )
        out = model.apply(params, x, train=False)
        dets = detect(out, TINY, anchors, use_pallas=False)
        n = TINY.max_detections
        assert dets.boxes.shape == (n, 4)
        assert dets.masks.shape == (n, 32, 40)
        assert dets.class_map.shape == TINY.input_size
        assert dets.id_map.shape == TINY.input_size

    def test_jit_forward(self, tiny_model):
        model, anchors, params = tiny_model

        @jax.jit
        def fwd(p, x):
            return model.apply(p, x, train=False)

        x = jnp.zeros((1, *TINY.input_size, 3), jnp.bfloat16)
        out = fwd(params, x)
        assert out.loc.shape[1] == anchors.shape[0]

    def test_reference_parity_semantic_shape(self):
        # 224×224 input → 28×28×81 semantic map, the reference's consumed
        # output tensor shape (src/yolact.rs:91,108)
        cfg = dataclasses.replace(TINY, input_size=(224, 224))
        model, _ = create_model(cfg)
        x = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(params, x, train=False)
        assert out.sem_logits.shape == (1, 28, 28, 81)

    def test_resnet_backbone_family(self):
        cfg = dataclasses.replace(TINY, name="yolact_r18_fpn", backbone="resnet18")
        model, anchors = create_model(cfg)
        x = jnp.zeros((1, *cfg.input_size, 3), jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(params, x, train=False)
        assert out.loc.shape == (1, anchors.shape[0], 4)

    def test_backbone_field_is_authoritative_under_default_name(self):
        """Regression (round 5): ModelConfig(backbone="resnet18") under the
        DEFAULT model name must actually build a ResNet — the mnv2 factory
        used to force backbone="mobilenetv2", so `train.run --backbone
        resnet50` silently trained MobileNetV2 (round 4's config-15 quality
        cells were three MNv2 checkpoints; caught when two different-backbone
        training curves matched to 4 decimals)."""
        import jax as _jax

        cfg_r = dataclasses.replace(TINY, backbone="resnet18")  # default name
        cfg_m = dataclasses.replace(TINY, backbone="mobilenetv2")
        assert cfg_r.name == "yolact_mnv2_fpn"  # the default entry point
        model_r, _ = create_model(cfg_r)
        model_m, _ = create_model(cfg_m)
        assert model_r.cfg.backbone == "resnet18"
        x = jnp.zeros((1, *cfg_r.input_size, 3), jnp.bfloat16)
        pr = model_r.init(jax.random.PRNGKey(0), x, train=False)
        pm = model_m.init(jax.random.PRNGKey(0), x, train=False)
        keys_r = _jax.tree_util.tree_structure(pr)
        keys_m = _jax.tree_util.tree_structure(pm)
        assert keys_r != keys_m, "resnet18 under the default name built MNv2"


class TestMaskKernel:
    def test_pallas_matches_jnp_oracle(self):
        rng = np.random.default_rng(0)
        protos = rng.normal(size=(32, 40, 16)).astype(np.float32)
        coeffs = rng.normal(size=(8, 16)).astype(np.float32)
        boxes = np.array(
            [[0.0, 0.0, 1.0, 1.0]] * 4 + [[0.2, 0.3, 0.7, 0.9]] * 4, np.float32
        )
        got = np.asarray(
            assemble_crop_masks(
                jnp.asarray(protos), jnp.asarray(coeffs), jnp.asarray(boxes)
            )
        )
        want = np.asarray(
            crop_masks(assemble_masks(jnp.asarray(protos), jnp.asarray(coeffs)), boxes)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestAnchorLayout:
    def test_anchor_order_is_position_major_ratio_innermost(self):
        """Lock the anchor memory layout to the head's (H, W, A·4) →
        (H·W·A, 4) reshape: anchor index (y*fw+x)*A + j must sit at cell
        (y, x), for every pyramid level and every ratio."""
        from tod_tpu.ops.anchors import feature_shapes, generate_anchors

        cfg = TINY
        anchors = np.asarray(generate_anchors(cfg))
        A = cfg.num_anchors
        base = 0
        for fh, fw in feature_shapes(cfg.input_size, cfg.strides):
            pts = {(0, 0), (fh - 1, fw - 1), (fh // 2, fw // 2), (min(1, fh - 1), min(2, fw - 1))}
            for y, x in pts:
                for j in range(A):
                    cy, cx = anchors[base + (y * fw + x) * A + j, :2]
                    assert abs(cy - (y + 0.5) / fh) < 1e-6, (fh, fw, y, x, j, cy)
                    assert abs(cx - (x + 0.5) / fw) < 1e-6, (fh, fw, y, x, j, cx)
            base += fh * fw * A
        assert base == anchors.shape[0]


class TestDetectInstanceIds:
    def test_two_balls_get_distinct_slot_ids(self):
        """Craft two confident, well-separated ball detections and check the
        id_map carries one dense id per detection (true instance ids, not the
        reference's connected-components hack)."""
        import jax.numpy as jnp
        from tod_tpu.ops.anchors import generate_anchors
        from tod_tpu.models.yolact import YolactOutputs, detect

        cfg = TINY
        anchors = jnp.asarray(generate_anchors(cfg))
        a = anchors.shape[0]
        # two anchors near opposite corners (P3 level, stride 8 on 128x160)
        fh, fw = 16, 20
        i1 = (2 * fw + 3) * cfg.num_anchors  # row 2, col 3
        i2 = (12 * fw + 16) * cfg.num_anchors  # row 12, col 16
        conf = jnp.full((1, a, cfg.det_num_classes), -10.0)
        conf = conf.at[0, i1, 3].set(10.0).at[0, i2, 3].set(10.0)
        loc = jnp.zeros((1, a, 4))
        # prototype 0 lights the whole frame; coeffs select it strongly
        protos = jnp.zeros((1, 32, 40, cfg.num_prototypes)).at[..., 0].set(5.0)
        coeff = jnp.zeros((1, a, cfg.num_prototypes)).at[..., 0].set(1.0)
        sem = jnp.zeros((1, 16, 20, cfg.num_classes))
        out = YolactOutputs(loc=loc, conf=conf, coeff=coeff, prototypes=protos, sem_logits=sem)
        dets = detect(out, cfg, anchors, use_pallas=False)
        ids = np.asarray(dets.id_map)
        cls = np.asarray(dets.class_map)
        ball_ids = set(np.unique(ids[cls == 3]).tolist())
        assert ball_ids == {0, 1}, f"expected dense ids {{0,1}}, got {ball_ids}"
        assert (ids[cls != 3] == -1).all()


class TestDepthwiseShiftedModel:
    """ModelConfig.depthwise_shifted (opt-in, measured negative on v5e —
    ops/depthwise.py): same param tree, same outputs either way."""

    def test_forward_equivalent_and_tree_identical(self, tiny_model):
        model, _anchors, params = tiny_model  # default graph: conv lowering
        shifted_cfg = dataclasses.replace(TINY, depthwise_shifted=True)
        model_shifted, _ = create_model(shifted_cfg)
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(1, *TINY.input_size, 3)),
            jnp.float32,
        )
        # identical param trees (paths AND init values): either graph must
        # accept the other's params verbatim, so checkpoints are portable
        params_shifted = model_shifted.init(jax.random.PRNGKey(0), x, train=False)
        tree = jax.tree_util.tree_structure
        assert tree(params) == tree(params_shifted)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_shifted)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_conv = model.apply(params, x, train=False)
        out_shift = model_shifted.apply(params, x, train=False)
        # bf16 compute: accumulation order differs between the two
        # formulations, so allow bf16-level slack
        np.testing.assert_allclose(
            np.asarray(out_conv.loc), np.asarray(out_shift.loc), rtol=0.03, atol=0.03
        )
        np.testing.assert_allclose(
            np.asarray(out_conv.prototypes),
            np.asarray(out_shift.prototypes),
            rtol=0.03,
            atol=0.03,
        )
