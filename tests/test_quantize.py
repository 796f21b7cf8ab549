"""Int8 weight quantization tests: roundtrip error bounds, pytree transform,
model-output tolerance (the reference's quantization-tolerance story,
SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.ops.quantize import (
    dequantize_params,
    quantize_params,
    quantize_tensor,
    quantize_tensor_pallas,
    quantized_size_bytes,
)


class TestTensorQuant:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.1, (64, 32)).astype(np.float32)
        q, scale = quantize_tensor(jnp.asarray(x))
        back = np.asarray(q, np.float32) * np.asarray(scale)
        # max error ≤ scale/2 per channel
        err = np.abs(back - x)
        assert (err <= np.asarray(scale) / 2 + 1e-8).all()

    def test_per_channel_scales(self):
        x = np.zeros((16, 2), np.float32)
        x[:, 0] = 1.0
        x[:, 1] = 100.0
        _, scale = quantize_tensor(jnp.asarray(x))
        s = np.asarray(scale)[0]
        assert s[1] == pytest.approx(100 / 127.0, rel=1e-5)
        assert s[0] == pytest.approx(1 / 127.0, rel=1e-5)

    def test_pallas_stochastic_unbiased(self):
        # the TPU PRNG primitives (prng_seed/prng_random_bits) have no CPU
        # interpret-mode lowering — this kernel is validated on hardware
        if jax.default_backend() != "tpu":
            pytest.skip("pltpu PRNG unavailable in CPU interpret mode")
        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.05, (256, 16)).astype(np.float32)
        q, scale = quantize_tensor_pallas(jnp.asarray(x), seed=3)
        back = np.asarray(q, np.float32) * np.asarray(scale)
        # stochastic rounding: mean error near zero, bounded by one step
        assert abs(float((back - x).mean())) < float(np.asarray(scale).mean())
        assert np.abs(back - x).max() <= float(np.asarray(scale).max()) + 1e-6


class TestModelQuant:
    def test_params_roundtrip_and_model_tolerance(self):
        from tod_tpu.core.config import ModelConfig
        from tod_tpu.models import create_model

        cfg = ModelConfig(
            input_size=(48, 64), fpn_channels=16, proto_channels=16,
            head_channels=16, width_mult=0.35, num_prototypes=8,
        )
        model, _ = create_model(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 64, 3)).astype(jnp.bfloat16)
        variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.PRNGKey(0))
        qvars = quantize_params(variables)
        dvars = dequantize_params(qvars)
        # int8 payload much smaller than f32 (scales + untouched leaves add a bit)
        orig = sum(np.asarray(l).nbytes for l in jax.tree.leaves(variables))
        assert quantized_size_bytes(qvars) < 0.45 * orig
        out_f = model.apply(variables, x, train=False)
        out_q = model.apply(dvars, x, train=False)
        # semantic logits within quantization tolerance
        a, b = np.asarray(out_f.sem_logits), np.asarray(out_q.sem_logits)
        denom = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.15


class TestConv8:
    """Int8 end-to-end inference path (models/qconv.py) — the TPU-native
    counterpart of the reference's u8 tflite graph (src/yolact.rs:172-177)."""

    def test_param_tree_matches_float_conv(self):
        """Conv8 and nn.Conv must create identical param trees so float
        checkpoints load into the quantized graph unchanged."""
        import dataclasses

        from tod_tpu.core.config import ModelConfig
        from tod_tpu.models.yolact import create_model

        tiny = ModelConfig(
            input_size=(64, 64), fpn_channels=16, proto_channels=16,
            head_channels=16, width_mult=0.25, num_prototypes=8, num_classes=8,
        )
        mf, _ = create_model(tiny)
        mq, _ = create_model(dataclasses.replace(tiny, quantized=True))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vf = jax.jit(lambda k: mf.init(k, x))(jax.random.PRNGKey(0))
        vq = jax.jit(lambda k: mq.init(k, x))(jax.random.PRNGKey(0))
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vq)
        for (kf, lf), (kq, lq) in zip(
            jax.tree_util.tree_leaves_with_path(vf),
            jax.tree_util.tree_leaves_with_path(vq),
        ):
            assert kf == kq and lf.shape == lq.shape

    def test_conv8_close_to_float_conv(self):
        """Single layer: int8 output within the per-tensor quantization error
        band of the float conv (symmetric 8-bit ⇒ ~1% of the activation range
        per operand)."""
        import flax.linen as nn

        from tod_tpu.models.qconv import Conv8

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 24, 8)).astype(np.float32))
        kw = dict(features=16, kernel_size=(3, 3), padding="SAME", dtype=jnp.float32)
        vf = nn.Conv(**kw).init(jax.random.PRNGKey(0), x)
        yf = np.asarray(nn.Conv(**kw).apply(vf, x))
        yq = np.asarray(Conv8(**kw).apply(vf, x))
        scale = np.abs(yf).max()
        assert np.abs(yq - yf).max() / scale < 0.05

    def test_native_matches_float_sim(self):
        """The int8-accumulating path and the float-simulated path run the
        same quantized integers; on CPU both trace to the float conv, on TPU
        the native path must agree to accumulation rounding."""
        from tod_tpu.models.qconv import Conv8

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
        kw = dict(features=8, kernel_size=(3, 3), dtype=jnp.float32)
        v = Conv8(**kw, native_int8=False).init(jax.random.PRNGKey(0), x)
        y_sim = np.asarray(Conv8(**kw, native_int8=False).apply(v, x))
        try:
            y_nat = np.asarray(Conv8(**kw, native_int8=True).apply(v, x))
        except Exception:
            pytest.skip("backend cannot lower s8 conv (expected off-TPU)")
        np.testing.assert_allclose(y_nat, y_sim, rtol=1e-5, atol=1e-5)

    def test_depthwise_and_strides(self):
        from tod_tpu.models.qconv import Conv8

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)).astype(np.float32))
        m = Conv8(
            features=8, kernel_size=(3, 3), strides=2, feature_group_count=8,
            use_bias=False, dtype=jnp.float32, native_int8=False,
        )
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 8, 8, 8)
        assert v["params"]["kernel"].shape == (3, 3, 1, 8)
