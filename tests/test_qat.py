"""Quantization-aware training (ModelConfig.qat, models/qconv.py).

The reference's u8 graph was produced by TF-side quantization tooling the
repo never shipped (data/README.md:27-32 — only the blob survives).  QAT is
the from-scratch counterpart: train THROUGH the int8 quantization grid with
straight-through gradients so the checkpoint that comes out is already
adapted to the static-int8 serve path (models/prepare.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import ModelConfig, TrainConfig
from tod_tpu.models.qconv import Conv8, fake_quantize, quantize_symmetric

QTINY = ModelConfig(
    input_size=(48, 64),
    fpn_channels=16,
    proto_channels=16,
    head_channels=16,
    width_mult=0.35,
    num_prototypes=8,
    nms_top_k=8,
    max_detections=4,
    quantized=True,
    qat=True,
)
QTRAIN = TrainConfig(batch_size=2, learning_rate=5e-3, warmup_steps=2, total_steps=20)


class TestFakeQuantize:
    def test_values_match_int8_grid(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(64,)).astype(np.float32))
        q, s = quantize_symmetric(x)
        np.testing.assert_allclose(
            np.asarray(fake_quantize(x)),
            np.asarray(q.astype(jnp.float32) * s),
            rtol=1e-6,
            atol=1e-7,
        )

    def test_ste_gradient_is_identity(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(32,)).astype(np.float32))
        g = np.asarray(jax.grad(lambda v: fake_quantize(v).sum())(x))
        # scale is stop-grad and no element exceeds the clip range, so every
        # element's gradient is exactly 1 — except the amax element, which
        # sits exactly ON the clip boundary where jnp.clip's min/max tie
        # yields 0.5 (a single element per tensor; irrelevant to training)
        amax_idx = int(np.argmax(np.abs(np.asarray(x))))
        mask = np.ones(32, bool)
        mask[amax_idx] = False
        np.testing.assert_allclose(g[mask], np.ones(31), rtol=1e-6)
        assert 0.0 <= g[amax_idx] <= 1.0

    def test_per_axis_scales(self):
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(3, 3, 4, 8)).astype(np.float32)
        )
        got = fake_quantize(x, axis=(0, 1, 2))
        q, s = quantize_symmetric(x, axis=(0, 1, 2))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(q.astype(jnp.float32) * s), rtol=1e-6, atol=1e-7
        )


class TestSTEUnblocksTraining:
    def test_kernel_gradients_dense_under_qat_sparse_under_dynamic_int8(self):
        """The dynamic int8 path's round() kills weight gradients almost
        everywhere (only the amax element feels the loss, through its scale);
        the QAT path's STE restores a dense gradient field."""
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(1, 8, 8, 4)).astype(np.float32)
        )
        qat = Conv8(8, (3, 3), qat=True, native_int8=False)
        dyn = Conv8(8, (3, 3), native_int8=False)
        params = qat.init(jax.random.PRNGKey(0), x)

        def loss(module, p):
            return (module.apply(p, x).astype(jnp.float32) ** 2).sum()

        g_qat = jax.grad(lambda p: loss(qat, p))(params)["params"]["kernel"]
        g_dyn = jax.grad(lambda p: loss(dyn, p))(params)["params"]["kernel"]
        frac_qat = float(jnp.mean(jnp.abs(g_qat) > 1e-8))
        frac_dyn = float(jnp.mean(jnp.abs(g_dyn) > 1e-8))
        assert frac_qat > 0.9, f"QAT gradient field not dense: {frac_qat:.3f}"
        # dynamic: per-cout scales -> at most one nonzero grad element per
        # output channel (the amax one), 8/288 here
        assert frac_dyn <= 8 / (3 * 3 * 4 * 8) + 1e-9, (
            f"dynamic int8 gradients unexpectedly dense: {frac_dyn:.3f}"
        )

    def test_qat_tree_matches_float_tree(self):
        """QAT checkpoints must load into the float AND int8 serve graphs."""
        from tod_tpu.models import create_model

        x = jnp.zeros((1, *QTINY.input_size, 3), jnp.bfloat16)
        m_qat, _ = create_model(QTINY)
        m_float, _ = create_model(
            dataclasses.replace(QTINY, quantized=False, qat=False)
        )
        v_qat = m_qat.init(jax.random.PRNGKey(0), x, train=False)
        v_float = m_float.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(v_qat) == jax.tree_util.tree_structure(
            v_float
        )


class TestQATTrains:
    def test_loss_decreases(self):
        from tod_tpu.train import SyntheticDetectionData, Trainer

        trainer = Trainer(QTINY, QTRAIN)
        data = SyntheticDetectionData(QTINY.input_size, batch_size=2, seed=1)
        first = trainer.train(data, steps=1, log_every=1, log_fn=lambda *_: None)
        later = trainer.train(data, steps=8, log_every=8, log_fn=lambda *_: None)
        assert np.isfinite(first["loss"]) and np.isfinite(later["loss"])
        assert later["loss"] < first["loss"]
