"""Training stack tests: matcher sanity, loss finiteness/decrease, checkpoint
roundtrip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import ModelConfig, TrainConfig
from tod_tpu.train import SyntheticDetectionData, Trainer, match_anchors
from tod_tpu.ops.anchors import generate_anchors

TINY = ModelConfig(
    input_size=(48, 64),
    fpn_channels=16,
    proto_channels=16,
    head_channels=16,
    width_mult=0.35,
    num_prototypes=8,
    nms_top_k=8,
    max_detections=4,
)
TTRAIN = TrainConfig(batch_size=2, learning_rate=5e-3, warmup_steps=2, total_steps=20)


class TestMatcher:
    def test_perfect_anchor_is_positive(self):
        anchors = jnp.asarray(generate_anchors(TINY))
        # craft a gt box exactly equal to anchor 10's extent
        a = anchors[10]
        gt = jnp.array(
            [[a[0] - a[2] / 2, a[1] - a[3] / 2, a[0] + a[2] / 2, a[1] + a[3] / 2]]
        )
        m = match_anchors(
            anchors, gt, jnp.array([3], jnp.int32), jnp.array([True])
        )
        assert bool(m["pos_mask"][10])
        assert int(m["cls_target"][10]) == 3
        # its encoded box target is ~zero offsets
        np.testing.assert_allclose(np.asarray(m["box_target"][10]), 0.0, atol=1e-5)

    def test_no_valid_gt_all_negative(self):
        anchors = jnp.asarray(generate_anchors(TINY))
        gt = jnp.zeros((2, 4))
        m = match_anchors(
            anchors, gt, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), bool)
        )
        assert not bool(m["pos_mask"].any())
        assert (np.asarray(m["cls_target"]) == 0).all()


class TestTrainer:
    @pytest.fixture(scope="class")
    def trainer(self):
        return Trainer(TINY, TTRAIN)

    def test_loss_decreases(self, trainer):
        data = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=1)
        first = trainer.train(data, steps=1, log_every=1, log_fn=lambda *_: None)
        later = trainer.train(data, steps=8, log_every=8, log_fn=lambda *_: None)
        assert np.isfinite(first["loss"]) and np.isfinite(later["loss"])
        assert later["loss"] < first["loss"]

    def test_checkpoint_roundtrip(self, trainer, tmp_path):
        path = tmp_path / "ckpt"
        trainer.save(str(path))
        t2 = Trainer(TINY, TTRAIN)
        before = [np.asarray(l) for l in jax.tree.leaves(t2.state.params)]
        t2.load(str(path))
        after = jax.tree.leaves(t2.state.params)
        want = jax.tree.leaves(trainer.state.params)
        for a, b in zip(after, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # restored params must differ from a fresh init SOMEWHERE (individual
        # leaves may legitimately sit at zero, e.g. barely-touched biases)
        assert any(
            not np.allclose(b, np.asarray(a)) for b, a in zip(before, after)
        )


class TestFocalLoss:
    def test_focal_finite_and_decreases(self):
        import dataclasses as dc

        tcfg = dc.replace(TTRAIN, cls_loss="focal")
        trainer = Trainer(TINY, tcfg)
        data = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=5)
        first = trainer.train(data, steps=1, log_every=1, log_fn=lambda *_: None)
        later = trainer.train(data, steps=8, log_every=8, log_fn=lambda *_: None)
        assert np.isfinite(first["loss"]) and later["loss"] < first["loss"]
