"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import ModelConfig, TrainConfig
from tod_tpu.parallel import make_mesh, param_sharding_tree, spatial_sharded_forward
from tod_tpu.train import SyntheticDetectionData, Trainer

TINY = ModelConfig(
    input_size=(48, 64),
    fpn_channels=16,
    proto_channels=16,
    head_channels=16,
    width_mult=0.35,
    num_prototypes=8,
)
TTRAIN = TrainConfig(batch_size=8, warmup_steps=2, total_steps=10)


def _require_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


class TestMesh:
    def test_make_mesh_shapes(self):
        _require_8()
        m = make_mesh(8, tp=2)
        assert m.shape == {"dp": 4, "tp": 2}
        with pytest.raises(ValueError):
            make_mesh(8, tp=3)

    def test_param_sharding_rule(self):
        _require_8()
        m = make_mesh(8, tp=2)
        tree = {
            "conv": jnp.zeros((3, 3, 8, 16)),
            "bias": jnp.zeros((16,)),
            "odd": jnp.zeros((3, 3, 8, 5)),
        }
        sh = param_sharding_tree(tree, m)
        assert "tp" in str(sh["conv"].spec)
        assert sh["bias"].spec == jax.sharding.PartitionSpec()
        assert sh["odd"].spec == jax.sharding.PartitionSpec()


class TestShardedTraining:
    @pytest.mark.parametrize("tp", [1, 2])
    def test_dp_tp_train_step_runs_and_matches_single(self, tp):
        _require_8()
        mesh = make_mesh(8, tp=tp)
        t_sharded = Trainer(TINY, TTRAIN, mesh=mesh)
        t_single = Trainer(TINY, TTRAIN)
        data = SyntheticDetectionData(TINY.input_size, batch_size=8, seed=3)
        batch = {k: jnp.asarray(v) for k, v in data.next_batch().items()}
        s1, m1 = t_sharded._step(t_sharded.state, batch)
        s2, m2 = t_single._step(t_single.state, batch)
        # same init seed + same batch → same loss regardless of sharding
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=2e-2
        )

    def test_spatial_partitioned_forward(self):
        _require_8()
        mesh = make_mesh(8, tp=1)
        from tod_tpu.models.yolact import create_model

        model, _ = create_model(TINY)
        x = jnp.zeros((1, *TINY.input_size, 3), jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def apply_fn(v, imgs):
            return model.apply(v, imgs, train=False).loc

        fwd = spatial_sharded_forward(apply_fn, mesh)
        out_sp = fwd(variables, x)
        out_ref = apply_fn(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_sp), np.asarray(out_ref), atol=2e-2
        )


class TestShardedInference:
    def test_dp_batched_inference(self):
        _require_8()
        import jax.numpy as jnp

        from tod_tpu.models.yolact import create_model
        from tod_tpu.parallel import make_mesh
        from tod_tpu.parallel.sharding import shard_inference

        mesh = make_mesh(8, tp=1)
        model, _ = create_model(TINY)
        x1 = jnp.zeros((1, *TINY.input_size, 3), jnp.bfloat16)
        variables = jax.jit(lambda k: model.init(k, x1, train=False))(
            jax.random.PRNGKey(0)
        )

        def fwd(v, imgs):
            return model.apply(v, imgs, train=False).loc

        jitted = shard_inference(fwd, mesh)(variables)
        xb = jnp.zeros((8, *TINY.input_size, 3), jnp.bfloat16)
        out = jitted(variables, xb)
        assert out.shape[0] == 8
        ref = fwd(variables, xb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-2
        )
