"""Sim-to-real training data tests: domain-randomized generator contract,
scene pool, and on-device augmentation (VERDICT r3 item 1 — the reference's
de-facto regression inputs are real photographs, reference src/yolact.rs:203-204,
and its author's reported failure was a model that didn't transfer to them,
reference README.md:8)."""

import numpy as np
import pytest

from tod_tpu.core.config import ModelConfig, TrainConfig
from tod_tpu.train import DomainRandomizedData, ScenePool, Trainer

HW = (48, 64)


def _check_batch_contract(b, batch, hw):
    h, w = hw
    assert b["image"].shape == (batch, h, w, 3) and b["image"].dtype == np.uint8
    assert b["gt_boxes"].shape == (batch, 6, 4)
    assert b["gt_classes"].dtype == np.int32
    assert b["gt_valid"].dtype == np.bool_
    assert b["gt_masks"].shape == (batch, 6, h // 4, w // 4)
    assert b["gt_masks"].dtype == np.float32
    assert b["sem_target"].shape == (batch, h // 8, w // 8)
    assert b["sem_target"].dtype == np.int32


class TestDomainRandomizedData:
    def test_batch_contract(self):
        d = DomainRandomizedData(HW, batch_size=3, seed=5)
        _check_batch_contract(d.next_batch(), 3, HW)

    def test_deterministic_per_seed(self):
        a = DomainRandomizedData(HW, batch_size=2, seed=7).next_batch()
        b = DomainRandomizedData(HW, batch_size=2, seed=7).next_batch()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_labels_consistent_with_pixels(self):
        """Randomized scenes must keep the label invariants: every valid row
        has a nonempty visible mask its box bounds tightly, masks are
        mutually disjoint (painter's occlusion), class ids are in range, and
        the semantic map agrees with the union of instance masks."""
        d = DomainRandomizedData(HW, batch_size=1, seed=11, legacy_prob=0.0)
        h, w = HW
        for _ in range(25):
            img, boxes, classes, valid, inst, sem = d._scene()
            union = np.zeros((h, w), bool)
            for k in range(len(valid)):
                m = inst[k] > 0.5
                if not valid[k]:
                    assert m.sum() == 0
                    continue
                assert m.any()
                assert classes[k] in (1, 2, 3)
                assert not (union & m).any(), "instance masks overlap"
                union |= m
                ys, xs = np.nonzero(m)
                np.testing.assert_allclose(
                    boxes[k],
                    [ys.min() / h, xs.min() / w, (ys.max() + 1) / h, (xs.max() + 1) / w],
                    atol=1e-6,
                )
                assert (sem[m] == classes[k]).all()
            assert (sem[~union] == 0).all()

    def test_legacy_prob_one_matches_parent_distribution(self):
        """legacy_prob=1.0 always routes to the plain procedural scene."""
        d = DomainRandomizedData(HW, batch_size=1, seed=3, legacy_prob=1.0)
        img, *_ = d._scene()
        # the legacy floor ramp is green-dominant at the bottom
        assert img[-1, :, 1].mean() > img[-1, :, 2].mean()

    def test_hard_negatives_put_saturation_in_the_background(self):
        """v2 clutter must include saturated background pixels.  v1 clutter
        was always desaturated, so saturation alone separated the classes —
        and the round-4 checkpoint then hallucinated balls/robots in
        red_robot.png's saturated crowd with 0.85+ confidence."""
        d = DomainRandomizedData((64, 80), batch_size=1, seed=13, legacy_prob=0.0)
        found = False
        for _ in range(40):
            img, _boxes, _classes, _valid, _inst, sem = d._scene()
            bg = sem == 0
            f = img.astype(np.float32)
            sat = f.max(-1) - f.min(-1)
            if bg.any() and (sat[bg] > 90).mean() > 0.01:
                found = True
                break
        assert found, "no scene had saturated background clutter"

    def test_scene_variety(self):
        """Across scenes the randomization must actually vary the domain:
        multiple ball colors and background brightnesses appear."""
        d = DomainRandomizedData((64, 80), batch_size=1, seed=2, legacy_prob=0.0)
        means = [d._scene()[0].mean() for _ in range(20)]
        assert np.std(means) > 10.0, "backgrounds do not vary"


class TestScenePool:
    def test_pool_serves_contract_batches(self):
        src = DomainRandomizedData(HW, batch_size=4, seed=1)
        pool = ScenePool(src, 10, seed=2, log_fn=lambda *_: None)
        assert len(pool) == 10
        _check_batch_contract(pool.next_batch(), 4, HW)

    def test_pool_samples_come_from_store(self):
        src = DomainRandomizedData(HW, batch_size=2, seed=1)
        pool = ScenePool(src, 6, seed=2, log_fn=lambda *_: None)
        b = pool.next_batch()
        imgs = pool._store["image"]
        for i in range(b["image"].shape[0]):
            assert any(
                np.array_equal(b["image"][i], imgs[j]) for j in range(len(pool))
            )

    def test_pool_cache_roundtrip(self, tmp_path):
        cache = tmp_path / "pool.npz"
        src = DomainRandomizedData(HW, batch_size=2, seed=1)
        p1 = ScenePool(src, 5, seed=2, cache=cache, log_fn=lambda *_: None)
        assert cache.exists()
        # reload: generator is NOT consulted (pass one that would explode)
        class Boom:
            batch = 2

            def next_batch(self):
                raise AssertionError("cache should have been used")

        p2 = ScenePool(Boom(), 5, seed=2, cache=cache, log_fn=lambda *_: None)
        for k in p1._store:
            np.testing.assert_array_equal(p1._store[k], p2._store[k])

    def test_pool_cache_size_mismatch_raises(self, tmp_path):
        cache = tmp_path / "pool.npz"
        src = DomainRandomizedData(HW, batch_size=2, seed=1)
        ScenePool(src, 4, cache=cache, log_fn=lambda *_: None)
        with pytest.raises(ValueError, match="4 scenes"):
            ScenePool(src, 8, cache=cache, log_fn=lambda *_: None)


class TestDeviceAugment:
    def test_flip_is_all_or_nothing_per_sample(self):
        """Each sample is either exactly the original or its exact mirror —
        image, masks, semantic target, and boxes must agree on which."""
        import jax

        from tod_tpu.train import device_augment

        src = DomainRandomizedData(HW, batch_size=4, seed=9)
        b = src.next_batch()
        out = device_augment(jax.random.PRNGKey(0), b, noise_max=0.0)
        sem = np.asarray(out["sem_target"])
        masks = np.asarray(out["gt_masks"])
        boxes = np.asarray(out["gt_boxes"])
        for i in range(4):
            as_is = np.array_equal(sem[i], b["sem_target"][i])
            mirrored = np.array_equal(sem[i], b["sem_target"][i][:, ::-1])
            assert as_is or mirrored
            flipped = mirrored and not as_is
            want_m = b["gt_masks"][i][:, :, ::-1] if flipped else b["gt_masks"][i]
            np.testing.assert_array_equal(masks[i], want_m)
            if flipped:
                v = b["gt_valid"][i]
                np.testing.assert_allclose(
                    boxes[i][v, 1], 1.0 - b["gt_boxes"][i][v, 3], atol=1e-6
                )
                np.testing.assert_allclose(
                    boxes[i][v, 3], 1.0 - b["gt_boxes"][i][v, 1], atol=1e-6
                )

    def test_photometrics_stay_in_range_and_vary(self):
        import jax

        from tod_tpu.train import device_augment

        src = DomainRandomizedData(HW, batch_size=2, seed=9)
        b = src.next_batch()
        out = device_augment(jax.random.PRNGKey(1), b)
        img = np.asarray(out["image"])
        assert img.min() >= 0.0 and img.max() <= 255.0
        assert not np.array_equal(img.astype(np.uint8), b["image"])

    def test_trainer_with_device_augment_is_deterministic(self):
        """device_augment keys on the step counter: two identical trainers
        see identical augmentation draws, so losses match exactly; and the
        loss stays finite through several steps."""
        mcfg = ModelConfig(
            input_size=HW, fpn_channels=16, proto_channels=16, head_channels=16,
            width_mult=0.35, num_prototypes=8, nms_top_k=8, max_detections=4,
        )
        tcfg = TrainConfig(
            batch_size=2, learning_rate=1e-3, warmup_steps=2, total_steps=6,
            device_augment=True,
        )
        losses = []
        for _ in range(2):
            tr = Trainer(mcfg, tcfg)
            data = DomainRandomizedData(HW, batch_size=2, seed=4)
            m = tr.train(data, steps=3, log_every=3, log_fn=lambda *_: None)
            losses.append(m["loss"])
            assert np.isfinite(m["loss"])
        assert losses[0] == losses[1]
