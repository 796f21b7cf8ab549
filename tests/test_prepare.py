"""Serving-parameter preparation tests: BN folding + static int8 PTQ
(models/prepare.py) — the load-time work that makes int8 the fast path
instead of round 2's slower-than-bf16 dynamic parity mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import ModelConfig
from tod_tpu.models import create_model
from tod_tpu.models.prepare import (
    calibrate_amax,
    fold_batchnorm,
    prepare_int8_params,
    quantize_prepared,
)

TINY = ModelConfig(
    input_size=(48, 64), fpn_channels=16, proto_channels=16, head_channels=16,
    width_mult=0.35, num_prototypes=8,
)


def _trained_stats_variables(model, x, n_steps: int = 3):
    """Variables with non-trivial batch_stats (a few train-mode applies)."""
    variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.PRNGKey(0))
    for i in range(n_steps):
        xi = x + 0.1 * (i + 1)
        _, mut = model.apply(variables, xi, train=True, mutable=["batch_stats"])
        variables = {**variables, "batch_stats": mut["batch_stats"]}
    return variables


class TestFoldBatchnorm:
    def test_forward_identical_after_fold(self):
        model, _ = create_model(TINY)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 48, 64, 3)).astype(np.float32))
        variables = _trained_stats_variables(model, x)
        folded = fold_batchnorm(variables)
        out = model.apply(variables, x, train=False)
        out_f = model.apply(folded, x, train=False)
        a, b = np.asarray(out.sem_logits), np.asarray(out_f.sem_logits)
        # bf16 compute: folding reassociates the per-channel gain, so agree
        # to bf16 resolution of the activation range
        np.testing.assert_allclose(a, b, atol=3e-2 * max(np.abs(a).max(), 1.0))

    def test_structure_preserved(self):
        model, _ = create_model(TINY)
        x = jnp.zeros((1, 48, 64, 3), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.PRNGKey(0))
        folded = fold_batchnorm(variables)
        assert jax.tree_util.tree_structure(
            jax.tree.map(np.asarray, dict(variables))
        ) == jax.tree_util.tree_structure(folded)

    def test_identity_bn_after_fold(self):
        model, _ = create_model(TINY)
        x = jnp.zeros((1, 48, 64, 3), jnp.float32)
        variables = _trained_stats_variables(model, x)
        folded = fold_batchnorm(variables)

        def _check(p, s):
            if "BatchNorm_0" in p:
                np.testing.assert_array_equal(p["BatchNorm_0"]["scale"], 1.0)
                np.testing.assert_array_equal(s["BatchNorm_0"]["mean"], 0.0)
                np.testing.assert_allclose(s["BatchNorm_0"]["var"], 1.0 - 1e-5)
            for k, v in p.items():
                if isinstance(v, dict):
                    _check(v, s.get(k, {}) if isinstance(s.get(k), dict) else {})

        _check(folded["params"], folded["batch_stats"])


class TestStaticInt8:
    @pytest.fixture(scope="class")
    def prepared(self):
        qcfg = dataclasses.replace(TINY, quantized=True)
        model, _ = create_model(qcfg)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 0.7, (1, 48, 64, 3)).astype(np.float32))
        variables = _trained_stats_variables(model, x)
        batches = [
            jnp.asarray(rng.normal(0, 0.7, (1, 48, 64, 3)).astype(np.float32))
            for _ in range(3)
        ]
        prepped = prepare_int8_params(model, variables, batches)
        return model, variables, prepped, x

    def test_prepared_tree_leaves(self, prepared):
        _, _, prepped, _ = prepared
        n_q = n_dw = 0

        def _walk(d):
            nonlocal n_q, n_dw
            for v in d.values():
                if not isinstance(v, dict):
                    continue
                if "kernel_q" in v:
                    n_q += 1
                    assert v["kernel_q"].dtype == np.int8
                    assert v["w_scale"].shape == (v["kernel_q"].shape[-1],)
                    assert v["act_scale"].shape == ()
                    assert "kernel" not in v
                elif "kernel" in v and getattr(v["kernel"], "ndim", 0) == 4:
                    # depthwise stays float, marked by the serve dtype
                    assert v["kernel"].shape[2] == 1
                    assert v["kernel"].dtype == jnp.bfloat16
                    n_dw += 1
                else:
                    _walk(v)

        _walk(prepped["params"])
        assert n_q > 10  # every dense conv in the tiny graph
        assert n_dw > 5  # the MNv2 depthwise stack

    def test_static_matches_dynamic_within_band(self, prepared):
        model, variables, prepped, x = prepared
        out_dyn = model.apply(fold_batchnorm(variables), x, train=False)
        out_st = model.apply(prepped, x, train=False)
        a, b = np.asarray(out_dyn.sem_logits), np.asarray(out_st.sem_logits)
        denom = max(np.abs(a).max(), 1e-3)
        # static calibrated scales vs dynamic per-sample scales: same 8-bit
        # grids up to the calibration amax mismatch
        assert np.abs(a - b).max() / denom < 0.2

    def test_static_close_to_float_model(self, prepared):
        model, variables, prepped, x = prepared
        fcfg = TINY  # same tree, float convs
        fmodel, _ = create_model(fcfg)
        out_f = fmodel.apply(variables, x, train=False)
        out_q = model.apply(prepped, x, train=False)
        a, b = np.asarray(out_f.sem_logits), np.asarray(out_q.sem_logits)
        denom = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.25

    def test_calibration_covers_every_dense_conv(self, prepared):
        model, variables, _, x = prepared
        calib = calibrate_amax(model, fold_batchnorm(variables), [x])
        n = 0

        def _count(d):
            nonlocal n
            for v in d.values():
                if isinstance(v, dict):
                    if "amax" in v:
                        n += 1
                        assert float(np.max(v["amax"])) > 0
                    else:
                        _count(v)

        _count(calib)
        assert n > 15

    def test_missing_calibration_raises(self):
        qcfg = dataclasses.replace(TINY, quantized=True)
        model, _ = create_model(qcfg)
        x = jnp.zeros((1, 48, 64, 3), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.PRNGKey(0))
        with pytest.raises(KeyError):
            quantize_prepared(fold_batchnorm(variables), {})


class TestEngineIntegration:
    def test_quantized_engine_prepares_tree(self):
        from tod_tpu.core.config import CameraConfig, PipelineConfig
        from tod_tpu.runtime import Engine

        cam = CameraConfig(width=64, height=48)
        qcfg = dataclasses.replace(TINY, quantized=True)
        cfg = PipelineConfig(camera=cam, model=qcfg)
        # float init tree as the "checkpoint"
        fmodel, _ = create_model(TINY)
        x0 = jnp.zeros((1, 48, 64, 3), jnp.bfloat16)
        params = jax.jit(lambda k: fmodel.init(k, x0, train=False))(jax.random.PRNGKey(0))
        params = jax.tree.map(np.asarray, dict(params))
        eng = Engine(cfg, params=params, mode="semantic", use_pallas=False)

        found_q = []

        def _walk(d):
            for v in d.values():
                if isinstance(v, dict):
                    if "kernel_q" in v:
                        found_q.append(v["kernel_q"].dtype)
                    else:
                        _walk(v)

        _walk(jax.tree.map(np.asarray, dict(eng.params))["params"])
        assert found_q, "Engine did not prepare the int8 tree"
        # and the prepared engine runs
        from tod_tpu.core.types import Frame

        frame = Frame(
            rgb=np.zeros((48, 64, 3), np.uint8), depth=np.full((48, 64), 900, np.uint16)
        )
        scene, dets = eng.process(frame)
        assert np.asarray(scene.height).shape == (48, 64)
