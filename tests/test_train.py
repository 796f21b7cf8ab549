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

    def test_one_hot_selection_matches_gather(self):
        """The matcher selects each anchor's gt box/class via a one-hot
        contraction (a TPU-profiled rewrite of an integer gather,
        train/matcher.py).  The rewrite must be EXACT: gate it against the
        plain gather formulation on random gt sets."""
        anchors = jnp.asarray(generate_anchors(TINY))
        rng = np.random.default_rng(0)
        m_slots = 6
        # sorted corner pairs → y1≤y2, x1≤x2; row-major reshape = y1x1y2x2
        gt = jnp.asarray(
            np.sort(rng.uniform(0, 1, (m_slots, 2, 2)), axis=1).reshape(m_slots, 4)
        )
        gt_cls = jnp.asarray(rng.integers(1, 4, (m_slots,)), jnp.int32)
        gt_valid = jnp.asarray([True, True, True, True, False, False])
        m = match_anchors(anchors, gt, gt_cls, gt_valid)

        idx = np.clip(np.asarray(m["matched_gt"]), 0, m_slots - 1)
        cls_gather = np.asarray(gt_cls)[idx]
        box_gather = np.asarray(gt)[idx]
        pos = np.asarray(m["pos_mask"])
        assert pos.any()  # the forced matches guarantee ≥4 positives
        np.testing.assert_array_equal(
            np.asarray(m["cls_target"])[pos], cls_gather[pos]
        )
        # the selector matmul reproduces the gathered gt boxes bit-exactly
        # (rows are 0/1, so each output element is one f32 value + zeros)
        from tod_tpu.ops.anchors import encode_boxes

        np.testing.assert_array_equal(
            np.asarray(m["box_target"])[pos],
            np.asarray(encode_boxes(jnp.asarray(box_gather), anchors))[pos],
        )

    def test_integer_ce_matches_optax(self):
        """losses._integer_ce (one-hot contraction) == optax's gather-based
        integer-label CE, to float tolerance, including extreme logits."""
        import optax

        from tod_tpu.train.losses import _integer_ce

        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(0, 10, (64, 81)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 81, (64,)), jnp.int32)
        np.testing.assert_allclose(
            np.asarray(_integer_ce(logits, labels)),
            np.asarray(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            ),
            rtol=1e-6,
            atol=1e-6,
        )


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

    def test_chunked_train_matches_per_step(self):
        """chunk>1 (lax.scan multi-step dispatch) must apply the SAME update
        sequence as the per-step loop — same data order, same state carry,
        same step count.  This is the dispatch-bound-training fix (one RTT
        per chunk instead of per step; docs/performance.md).

        Gate horizon is 2 steps, and deliberately so.  Measured facts
        (SGD + f32 + focal, this exact setup): step-1 loss is BIT-IDENTICAL
        across the scan and per-step programs; step-2 loss differs 2.3e-7
        relative (the two XLA programs reassociate gradient reductions
        differently — ULP-level); by step 3 the difference is 1e-3+ at ANY
        learning rate (even 1e-5), because the unnormalized YOLACT loss has
        lr·λmax > 1 curvature early in training and amplifies a ULP ~1e4×
        per step — chaotic dynamics, not a chunking bug.  So the 2-step
        horizon is where the mechanism is provably gateable; the AdamW test
        below covers multi-step + the mixed scan+tail path at a
        training-outcome tolerance.  Focal (not OHEM) because OHEM's
        conf-ranked top-k negative selection is additionally discontinuous
        in params (a ULP flips the selected set → O(1) gradient change);
        SGD (not Adam) because Adam turns a ULP on a near-zero-gradient
        element into a full ±lr·sign step."""
        import optax

        cfg = dataclasses.replace(TINY, dtype="float32")
        ttrain = dataclasses.replace(TTRAIN, cls_loss="focal")
        tx = optax.sgd(1e-5)
        t1 = Trainer(cfg, ttrain, tx=tx)
        t2 = Trainer(cfg, ttrain, tx=tx)
        d1 = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=3)
        d2 = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=3)
        m1 = t1.train(d1, steps=2, log_every=10, log_fn=lambda *_: None)
        m2 = t2.train(d2, steps=2, log_every=10, log_fn=lambda *_: None, chunk=2)
        assert m1["loss"] == pytest.approx(m2["loss"], rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
        ):
            # measured maxdiff 1.1e-4 (one curvature amplification of the
            # step-1 gradient ULPs); 2e-3 gives ~18x headroom while still
            # catching any wrong-batch / dropped-step / stale-state bug,
            # whose signature is O(lr·|g|) ~ 1e-1
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-3
            )
        assert int(t1.state.step) == int(t2.state.step) == 2

    def test_chunked_train_adamw_loss_tracks(self):
        """With the real AdamW recipe (warmup, cosine, global-norm clip) the
        chunked run must still TRAIN the same — loss after 4 steps within a
        few %.  chunk=3 over 4 steps exercises the mixed path: one scan-of-3
        dispatch plus a trailing per-step call on the carried state.  Exact
        param equality is not gateable across compilations (see above)."""
        t1 = Trainer(TINY, TTRAIN)
        t2 = Trainer(TINY, TTRAIN)
        d1 = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=3)
        d2 = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=3)
        m1 = t1.train(d1, steps=4, log_every=10, log_fn=lambda *_: None)
        m2 = t2.train(d2, steps=4, log_every=10, log_fn=lambda *_: None, chunk=3)
        assert m1["loss"] == pytest.approx(m2["loss"], rel=5e-2)
        assert int(t1.state.step) == int(t2.state.step) == 4

    def test_in_training_eval_and_best_checkpoint(self, tmp_path):
        """eval_every runs the held-out sweep on the LIVE state through
        reused engines and keeps the best-mAP checkpoint at best_path; the
        returned metrics carry eval_map50/eval_best_map50."""
        t = Trainer(TINY, TTRAIN)
        data = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=1)
        best = tmp_path / "best"
        logs = []
        m = t.train(
            data, steps=2, log_every=10, log_fn=logs.append,
            eval_every=1, eval_scenes=2, best_path=str(best),
        )
        assert "eval_map50" in m and "eval_best_map50" in m
        assert m["eval_best_map50"] >= m["eval_map50"] - 1e-9
        assert best.exists()  # something was best at least once
        assert any("eval @ step" in s for s in logs)
        # engines were built once and reused
        assert t._eval_engines is not None
        # the kept checkpoint round-trips through the ordinary loader
        from tod_tpu.train.checkpoint import load_checkpoint

        tree = load_checkpoint(str(best))
        assert "params" in tree

    def test_prefetch_preserves_order(self):
        """The background staging thread must consume ``data.next_batch()``
        strictly sequentially: the yielded chunk stream equals the serial
        stream batch-for-batch (the chunked-equivalence tests above rely on
        this; a reorder would silently change the update sequence)."""
        from tod_tpu.train.prefetch import PrefetchChunks, chunk_schedule

        class Counter:
            def __init__(self):
                self.i = 0

            def next_batch(self):
                self.i += 1
                return {"x": np.full((2, 3), self.i, np.int32)}

        sizes = chunk_schedule(steps=7, chunk=3)
        assert sizes == [3, 3, 1]
        chunks = list(PrefetchChunks(Counter(), sizes, depth=2))
        seq = [int(c["x"][j, 0, 0]) for c in chunks for j in range(c["x"].shape[0])]
        assert seq == [1, 2, 3, 4, 5, 6, 7]
        assert chunks[0]["x"].shape == (3, 2, 3) and chunks[2]["x"].shape == (1, 2, 3)

    def test_prefetch_propagates_producer_errors(self):
        from tod_tpu.train.prefetch import PrefetchChunks

        class Boom:
            def __init__(self):
                self.i = 0

            def next_batch(self):
                self.i += 1
                if self.i == 3:
                    raise RuntimeError("source died")
                return {"x": np.zeros((1,), np.int32)}

        it = iter(PrefetchChunks(Boom(), [2, 2], depth=1))
        next(it)  # first chunk fine
        with pytest.raises(RuntimeError, match="source died"):
            next(it)

    def test_resume_continues_exact_trajectory(self, tmp_path):
        """save_state/load_state resume the EXACT optimization trajectory:
        train 3+2 steps in one run vs 3, checkpoint, restore into a fresh
        Trainer, 2 more on the aligned data stream — identical params
        (same-process compilations of the same program are deterministic;
        plain save/load would reset Adam moments and the LR schedule and
        diverge)."""
        t1 = Trainer(TINY, TTRAIN)
        d1 = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=6)
        t1.train(d1, steps=3, log_every=10, log_fn=lambda *_: None)
        t1.save_state(str(tmp_path / "full"))
        t1.train(d1, steps=2, log_every=10, log_fn=lambda *_: None)

        t2 = Trainer(TINY, TTRAIN)
        t2.load_state(str(tmp_path / "full"))
        assert int(t2.state.step) == 3
        d2 = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=6)
        for _ in range(3):  # align the resumed data stream
            d2.next_batch()
        t2.train(d2, steps=2, log_every=10, log_fn=lambda *_: None)

        assert int(t1.state.step) == int(t2.state.step) == 5
        for a, b in zip(
            jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=0, atol=0,
            )

    def test_periodic_state_saves_enable_mid_run_resume(self, tmp_path):
        """state_every persists the full training state mid-run (crash-safe
        replace): a 'killed' campaign resumes from the LAST interval — the
        restored step matches the save cadence, and training continues from
        there to the original target (the long-campaign survivability
        contract; run.py --state-every)."""
        sp = str(tmp_path / "camp_state")
        tr = Trainer(TINY, TTRAIN)
        data = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=3)
        tr.train(
            data, steps=5, log_every=10, log_fn=lambda *_: None,
            state_path=sp, state_every=2,
        )
        # intervals at steps 2 and 4; step 5 (the end) is NOT a state save
        tr2 = Trainer(TINY, TTRAIN)
        tr2.load_state(sp)
        assert int(tr2.state.step) == 4
        # "relaunch": continue the remaining steps to the target of 5
        m = tr2.train(
            SyntheticDetectionData(TINY.input_size, batch_size=2, seed=3),
            steps=5 - int(tr2.state.step), log_every=1, log_fn=lambda *_: None,
        )
        assert int(tr2.state.step) == 5
        assert np.isfinite(m["loss"])

    def test_load_state_rejects_optimizer_mismatch(self, tmp_path):
        import optax

        t1 = Trainer(TINY, TTRAIN)
        t1.save_state(str(tmp_path / "full"))
        t2 = Trainer(TINY, TTRAIN, tx=optax.sgd(1e-3))
        with pytest.raises(ValueError, match="optimizer state mismatch"):
            t2.load_state(str(tmp_path / "full"))

    def test_disk_dataset_roundtrip(self, tmp_path):
        """export_dataset → DiskDetectionData reproduces the generator's
        batch contract: same keys/shapes/dtypes, and for a same-size export
        (no resize) the images, boxes, classes, downsampled masks and
        semantic targets match the source scenes exactly."""
        from tod_tpu.train import DiskDetectionData, export_dataset

        src = SyntheticDetectionData(TINY.input_size, batch_size=1, seed=21)
        root = export_dataset(
            SyntheticDetectionData(TINY.input_size, batch_size=1, seed=21),
            tmp_path / "ds", n_scenes=3,
        )
        disk = DiskDetectionData(
            root, TINY.input_size, batch_size=3, seed=0, shuffle=False
        )
        got = disk.next_batch()
        want = [src._scene() for _ in range(3)]
        ref = SyntheticDetectionData(TINY.input_size, batch_size=3, seed=21)
        refb = ref.next_batch()
        assert sorted(got) == sorted(refb)
        for k in refb:
            assert got[k].shape == refb[k].shape, k
            assert got[k].dtype == refb[k].dtype, k
        # shuffle=False consumes in annotation order; compare per-scene
        for bi in range(3):
            img, boxes, classes, valid, inst, sem = want[bi]
            np.testing.assert_array_equal(got["image"][bi], img)
            np.testing.assert_allclose(
                got["gt_boxes"][bi], boxes.astype(np.float32), atol=1e-6
            )
            np.testing.assert_array_equal(got["gt_classes"][bi], classes)
            np.testing.assert_array_equal(got["gt_valid"][bi], valid)
            np.testing.assert_array_equal(
                got["gt_masks"][bi], src._downsample_mask(inst, 4)
            )
            np.testing.assert_array_equal(
                got["sem_target"][bi], src._downsample_sem(sem, 8)
            )

    def test_disk_dataset_trains_and_boxless_masks(self, tmp_path):
        """A train step runs from the on-disk pipeline, and records without
        mask files fall back to box-interior masks instead of failing."""
        import json

        from tod_tpu.train import DiskDetectionData, export_dataset

        root = export_dataset(
            SyntheticDetectionData(TINY.input_size, batch_size=1, seed=4),
            tmp_path / "ds", n_scenes=2,
        )
        # strip the mask files from one record → box-supervised fallback
        spec = json.loads((root / "annotations.json").read_text())
        for obj in spec["images"][0]["objects"]:
            obj.pop("mask")
        (root / "annotations.json").write_text(json.dumps(spec))
        data = DiskDetectionData(root, TINY.input_size, batch_size=2, seed=0)
        t = Trainer(TINY, TTRAIN)
        m = t.train(data, steps=2, log_every=10, log_fn=lambda *_: None)
        assert np.isfinite(m["loss"])
        b = data.next_batch()
        assert b["gt_masks"].max() == 1.0  # fallback produced real masks

    def test_augment_flip_is_label_consistent(self):
        """A forced horizontal flip must keep labels aligned with pixels:
        rebuilding the semantic map from the flipped masks+classes matches
        the flipped semantic target, and flipped boxes still bound their
        flipped masks."""
        from tod_tpu.train import Augmented

        src = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=12)
        ref = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=12)
        aug = Augmented(src, seed=0, brightness=0, contrast=0)
        aug.rng = type("R", (), {"random": staticmethod(lambda: 0.0),
                                 "uniform": staticmethod(lambda a, b: 0.0)})()
        got = aug.next_batch()
        want = ref.next_batch()
        np.testing.assert_array_equal(got["image"], want["image"][:, :, ::-1])
        np.testing.assert_array_equal(got["sem_target"], want["sem_target"][:, :, ::-1])
        np.testing.assert_array_equal(got["gt_masks"], want["gt_masks"][:, :, :, ::-1])
        np.testing.assert_array_equal(got["gt_valid"], want["gt_valid"])
        for i in range(2):
            for k in range(want["gt_valid"].shape[1]):
                if not want["gt_valid"][i, k]:
                    continue
                y1, x1, y2, x2 = want["gt_boxes"][i, k]
                np.testing.assert_allclose(
                    got["gt_boxes"][i, k], [y1, 1 - x2, y2, 1 - x1], atol=1e-6
                )
                # flipped box still bounds the flipped mask (at proto res)
                m = got["gt_masks"][i, k]
                ys, xs = np.nonzero(m > 0.5)
                if len(xs):
                    h4, w4 = m.shape
                    assert xs.min() / w4 >= got["gt_boxes"][i, k][1] - 1 / w4 - 1e-6
                    assert (xs.max() + 1) / w4 <= got["gt_boxes"][i, k][3] + 1 / w4 + 1e-6

    def test_metrics_jsonl_record(self, tmp_path):
        """metrics_path appends one JSON line per log/eval event with kind,
        step and wall clock — the machine-readable training record."""
        import json

        t = Trainer(TINY, TTRAIN)
        data = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=1)
        mp = tmp_path / "metrics.jsonl"
        t.train(data, steps=2, log_every=1, log_fn=lambda *_: None,
                eval_every=2, eval_scenes=1, metrics_path=str(mp))
        rows = [json.loads(line) for line in mp.read_text().splitlines()]
        kinds = [r["kind"] for r in rows]
        assert kinds.count("train") == 2 and kinds.count("eval") == 1
        for r in rows:
            assert {"kind", "step", "wall_s"} <= set(r)
        assert any("map50" in r for r in rows if r["kind"] == "eval")
        assert all(np.isfinite(r["loss"]) for r in rows if r["kind"] == "train")

    def test_augment_trains(self):
        from tod_tpu.train import Augmented

        data = Augmented(
            SyntheticDetectionData(TINY.input_size, batch_size=2, seed=1), seed=2
        )
        t = Trainer(TINY, TTRAIN)
        m = t.train(data, steps=2, log_every=10, log_fn=lambda *_: None)
        assert np.isfinite(m["loss"])

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

    def test_init_from_is_params_only_warm_start(self, trainer, tmp_path):
        """run.py --init-from semantics: params (+ batch stats) come from the
        serving checkpoint, but the step counter and optimizer are FRESH —
        fine-tuning restarts the schedule instead of continuing a trajectory
        (that is --resume's job)."""
        trainer.train(
            SyntheticDetectionData(TINY.input_size, batch_size=2, seed=8),
            steps=2, log_every=10, log_fn=lambda *_: None,
        )
        path = tmp_path / "ckpt"
        trainer.save(str(path))
        t2 = Trainer(TINY, TTRAIN)
        t2.load(str(path))
        assert int(t2.state.step) == 0
        for a, b in zip(
            jax.tree.leaves(t2.state.params), jax.tree.leaves(trainer.state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        m = t2.train(
            SyntheticDetectionData(TINY.input_size, batch_size=2, seed=9),
            steps=1, log_every=10, log_fn=lambda *_: None,
        )
        assert int(t2.state.step) == 1 and np.isfinite(m["loss"])

    def test_checkpoint_save_is_crash_safe_replace(self, trainer, tmp_path):
        """save-as-replace must never destroy the previous checkpoint before
        the new one is complete (the best-checkpoint keeper overwrites one
        path for a whole run), and load recovers from the mid-swap crash
        window."""
        from tod_tpu.train.checkpoint import load_checkpoint

        path = tmp_path / "ckpt"
        trainer.save(str(path))
        trainer.save(str(path))  # replace over existing works
        assert path.exists()
        assert not path.with_name("ckpt.saving").exists()
        assert not path.with_name("ckpt.replaced").exists()
        # simulate dying between the two swap renames: the complete new
        # checkpoint sits at .saving, nothing at the target path
        path.rename(path.with_name("ckpt.saving"))
        restored = load_checkpoint(str(path))
        want = jax.tree.leaves(trainer.state.params)
        got = jax.tree.leaves(restored["params"])
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_prefetch_close_releases_producer(self):
        """An abandoned consumer (training loop raised mid-chunk) must not
        leave the prefetch producer blocked on the bounded queue forever."""
        from tod_tpu.train.prefetch import PrefetchChunks
        from tod_tpu.train.synthetic_data import SyntheticDetectionData

        data = SyntheticDetectionData((32, 32), batch_size=1, seed=0)
        p = PrefetchChunks(data, sizes=[2] * 50, depth=1)
        next(iter(p))  # consume one chunk, then abandon
        p.close()
        assert not p._thread.is_alive()


class TestFocalLoss:
    def test_focal_finite_and_decreases(self):
        import dataclasses as dc

        tcfg = dc.replace(TTRAIN, cls_loss="focal")
        trainer = Trainer(TINY, tcfg)
        data = SyntheticDetectionData(TINY.input_size, batch_size=2, seed=5)
        first = trainer.train(data, steps=1, log_every=1, log_fn=lambda *_: None)
        later = trainer.train(data, steps=8, log_every=8, log_fn=lambda *_: None)
        assert np.isfinite(first["loss"]) and later["loss"] < first["loss"]
