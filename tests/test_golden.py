"""Golden-fixture tests on the reference's committed test images
(data/frc_balls.png, data/red_robot.png — its de-facto regression inputs,
SURVEY.md §4 "Golden-image fixtures").

With untrained weights the *numeric* outputs aren't meaningful, so these pin
the behavioral contracts: determinism (same input → identical output),
shape/dtype/value-range invariants, and wire-format round trips on real image
content.  Once a trained checkpoint is pinned, mask-IoU goldens slot in here.
"""

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path("/root/reference/data")

from tod_tpu.core.config import (
    CameraConfig,
    GeometryConfig,
    ModelConfig,
    PipelineConfig,
    PlannerConfig,
)
from tod_tpu.runtime import Engine, PNGSource
from tod_tpu.runtime.classify import Classifier

TINY_CAM = CameraConfig(width=64, height=48)
TINY_CFG = PipelineConfig(
    camera=TINY_CAM,
    model=ModelConfig(
        input_size=(48, 64),
        fpn_channels=16,
        proto_channels=16,
        head_channels=16,
        width_mult=0.35,
        num_prototypes=8,
        nms_top_k=8,
        max_detections=4,
    ),
    geometry=GeometryConfig(terrain_norm_const=2, bot_norm_const=3),
    planner=PlannerConfig(backend="numpy"),
)


@pytest.fixture(scope="module", params=["frc_balls.png", "red_robot.png"])
def fixture_source(request):
    path = FIXTURES / request.param
    if not path.exists():
        pytest.skip(f"fixture {path} unavailable")
    return PNGSource(path, TINY_CAM, n_frames=2)


class TestGoldenFixtures:
    def test_engine_deterministic_on_fixture(self, fixture_source):
        eng = Engine(TINY_CFG, mode="detect", use_pallas=False)
        frames = list(fixture_source.frames())
        s1, d1 = eng.process(frames[0])
        s2, d2 = eng.process(frames[1])
        np.testing.assert_array_equal(np.asarray(s1.height), np.asarray(s2.height))
        np.testing.assert_array_equal(np.asarray(d1.class_map), np.asarray(d2.class_map))

    def test_scene_invariants_on_fixture(self, fixture_source):
        eng = Engine(TINY_CFG, mode="semantic", use_pallas=False)
        frame = next(fixture_source.frames())
        scene, dets = eng.process(frame)
        h = np.asarray(scene.height)
        assert np.isfinite(h).all() and (h >= 0).all()
        conns = np.asarray(scene.connections)
        valid = conns[conns >= 0]
        assert valid.min() >= 1.0 - 1e-5  # min edge length is 1 (flat neighbors)
        cls = np.asarray(dets.class_map)
        assert cls.max() <= 3

    def test_classifier_word_contract_on_fixture(self, fixture_source):
        import jax.numpy as jnp

        from tod_tpu.ops.packing import pack_rgb_u32

        clf = Classifier(TINY_CFG)
        frame = next(fixture_source.frames())
        words = np.asarray(pack_rgb_u32(jnp.asarray(frame.rgb)))
        out1 = clf.classify(words)
        out2 = clf.classify(words)
        np.testing.assert_array_equal(out1, out2)
        assert (out1 & 0xFFFF == 0).all()


class TestTrainedCheckpoint:
    """End-to-end behavior with the pinned trained checkpoint (skipped if the
    checkpoint isn't present)."""

    def test_finds_balls_and_plans(self):
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_synth"
        if not ckpt.exists():
            pytest.skip("pinned checkpoint not present")
        from tod_tpu.core.config import PipelineConfig, CameraConfig, ModelConfig, PlannerConfig
        from tod_tpu.planner.api import plan_from_height
        from tod_tpu.runtime import SyntheticSource
        from tod_tpu.train.checkpoint import load_checkpoint

        params = load_checkpoint(str(ckpt))
        cam = CameraConfig(width=320, height=240)
        cfg = PipelineConfig(
            camera=cam,
            model=ModelConfig(input_size=(240, 320)),
            planner=PlannerConfig(backend="auto"),
        )
        eng = Engine(cfg, params=params, mode="semantic", use_pallas=False)
        frame = next(SyntheticSource(cam, seed=7, n_frames=1).frames())
        scene, dets = eng.process(frame)
        cls = np.asarray(dets.class_map)
        balls = np.asarray(scene.balls)
        # the seed-7 synthetic scene contains two balls and two robots
        assert (cls == 3).sum() > 200, "ball pixels detected"
        assert ((cls == 1) | (cls == 2)).sum() > 500, "robot pixels detected"
        assert (balls[:, 2] > 0).sum() >= 1, "ball centroid slots populated"
        path = plan_from_height(np.asarray(scene.height), balls, cfg.planner)
        assert len(path.directions) > 50, "a real path to a ball was planned"

    @pytest.mark.slowgate
    def test_mask_iou_vs_ground_truth(self):
        """Mask-IoU golden (docs/roadmap.md §1): the pinned checkpoint's
        semantic masks must overlap the procedural generator's exact ground
        truth — a numeric quality gate, not just a behavioral one."""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_synth"
        if not ckpt.exists():
            pytest.skip("pinned checkpoint not present")
        from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig
        from tod_tpu.core.types import Frame
        from tod_tpu.train.checkpoint import load_checkpoint
        from tod_tpu.train.synthetic_data import SyntheticDetectionData

        params = load_checkpoint(str(ckpt))
        cam = CameraConfig(width=320, height=240)
        cfg = PipelineConfig(camera=cam, model=ModelConfig(input_size=(240, 320)))
        eng = Engine(cfg, params=params, mode="semantic", use_pallas=False)

        # held-out seed (training used seed 2) with full-res GT semantic masks
        data = SyntheticDetectionData((240, 320), batch_size=1, seed=1234)
        ramp = np.linspace(3500, 600, 240).astype(np.uint16)
        depth = np.broadcast_to(ramp[:, None], (240, 320)).copy()
        ious = {3: [], 1: [], 2: []}
        for _ in range(3):
            img, _, _, _, _, sem = data._scene()
            _, dets = eng.process(Frame(rgb=img, depth=depth))
            pred = np.asarray(dets.class_map)
            for c in ious:
                gt = sem == c
                if gt.sum() < 50:
                    continue  # class absent from this scene
                pc = pred == c
                ious[c].append((gt & pc).sum() / max((gt | pc).sum(), 1))
        per_class = {c: np.mean(v) for c, v in ious.items() if v}
        assert per_class, "no classes present across scenes"
        for c, iou in per_class.items():
            assert iou > 0.55, f"class {c} mask IoU {iou:.3f} below golden band"

    @pytest.mark.slowgate
    def test_detection_quality_held_out(self):
        """Detection-path golden: with the pinned checkpoint, held-out
        procedural scenes must be *well* detected — recall@IoU50 ≥ 0.8,
        ≈1 detection per GT object, mean best-IoU ≥ 0.7 (VERDICT round 1
        target).  This gates the real YOLACT capability the reference
        abandoned (src/yolact.rs:92-94)."""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_synth"
        if not ckpt.exists():
            pytest.skip("pinned checkpoint not present")
        from tod_tpu.train.evaluate import evaluate

        m = evaluate(str(ckpt), n_scenes=8, seed=9999)
        assert m["det_recall_iou50"] >= 0.8, m
        assert m["det_best_box_iou_mean"] >= 0.7, m
        assert 0.5 <= m["detections_per_gt"] <= 1.6, m
        # COCO-style mAP (greedy matching, duplicates penalized as FPs);
        # pinned checkpoint measures mAP@.5 0.991, mAP@[.5:.95] 0.919
        assert m["map50"] >= 0.9, m
        assert m["map50_95"] >= 0.75, m
        # per-instance binary masks (the YOLACT capability, not just the
        # semantic map): pinned checkpoint measures 0.87
        assert m["inst_mask_iou_mean"] >= 0.75, m

    @pytest.mark.slowgate
    def test_disk_dataset_eval_matches_synthetic(self, tmp_path):
        """Evaluating against an on-disk export of the SAME held-out scenes
        (seed 9999) must reproduce the synthetic-eval metrics — the PNG/json
        round trip is lossless for images and masks and ~1e-7 for boxes, so
        any drift would mean the disk eval path mis-loads annotations."""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_synth"
        if not ckpt.exists():
            pytest.skip("pinned checkpoint not present")
        from tod_tpu.train.checkpoint import load_checkpoint
        from tod_tpu.train.dataset import export_dataset
        from tod_tpu.train.evaluate import (
            disk_eval_scenes,
            evaluate,
            evaluate_engines,
            make_eval_engines,
        )
        from tod_tpu.train.synthetic_data import SyntheticDetectionData

        hw = (240, 320)
        root = export_dataset(
            SyntheticDetectionData(hw, batch_size=1, seed=9999), tmp_path / "ds", 4
        )
        eng, eng_sem = make_eval_engines(hw, params=load_checkpoint(str(ckpt)))
        got = evaluate_engines(
            eng, eng_sem, hw=hw, scenes=disk_eval_scenes(root, hw, 4)
        )
        want = evaluate(str(ckpt), n_scenes=4, seed=9999)
        for k in ("map50", "det_recall_iou50", "det_best_box_iou_mean",
                  "inst_mask_iou_mean", "detections_per_gt"):
            assert got[k] == pytest.approx(want[k], abs=2e-3), (k, got[k], want[k])

    @pytest.mark.slowgate
    def test_quantized_engine_matches_float_within_band(self):
        """Int8 end-to-end engine (ModelConfig.quantized) vs the bf16 engine on
        the same pinned weights: per-pixel class maps must agree within the
        quantization-tolerance band (the reference's u8-graph parity story,
        SURVEY.md §7)."""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_synth"
        if not ckpt.exists():
            pytest.skip("pinned checkpoint not present")
        import dataclasses

        from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig
        from tod_tpu.runtime import SyntheticSource
        from tod_tpu.train.checkpoint import load_checkpoint

        params = load_checkpoint(str(ckpt))
        cam = CameraConfig(width=320, height=240)
        mcfg = ModelConfig(input_size=(240, 320))
        cfg_f = PipelineConfig(camera=cam, model=mcfg)
        cfg_q = PipelineConfig(camera=cam, model=dataclasses.replace(mcfg, quantized=True))
        eng_f = Engine(cfg_f, params=params, mode="semantic", use_pallas=False)
        eng_q = Engine(cfg_q, params=params, mode="semantic", use_pallas=False)
        frame = next(SyntheticSource(cam, seed=7, n_frames=1).frames())
        _, d_f = eng_f.process(frame)
        _, d_q = eng_q.process(frame)
        cf = np.asarray(d_f.class_map)
        cq = np.asarray(d_q.class_map)
        agree = (cf == cq).mean()
        assert agree > 0.98, f"quantized class map diverges: agreement {agree:.4f}"
        for c in (1, 2, 3):
            a, b = cf == c, cq == c
            if a.sum() < 50:
                continue
            iou = (a & b).sum() / max((a | b).sum(), 1)
            assert iou > 0.85, f"class {c} float-vs-int8 IoU {iou:.3f}"


class TestDomainRandomizedCheckpoint:
    """Round-4 pinned checkpoint (domain-randomized campaign,
    checkpoints/yolact_dr): the sim-to-real gates (VERDICT r3 item 1).

    The reference's de-facto regression inputs are real photographs wired in
    as camera substitutes (reference src/yolact.rs:203-204) and its author's
    reported failure was a model that did not work on them (reference
    README.md:8).  These gates assert OUR pinned model detects the real
    fixtures against hand-labeled masks (tests/fixtures/real/,
    tools/label_real_fixtures.py) — the round-3 synthetic-only checkpoint
    measured mAP@.5 = 0.0 here — and holds up on a cross-domain generator
    (the perspective-projected sim renderer) it never trained on.
    Skipped until the campaign checkpoint is pinned."""

    HW = (240, 320)

    @pytest.fixture(scope="class")
    def engines(self):
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_dr"
        if not ckpt.exists():
            pytest.skip("domain-randomized pinned checkpoint not present")
        from tod_tpu.train.checkpoint import load_checkpoint
        from tod_tpu.train.evaluate import make_eval_engines

        return make_eval_engines(self.HW, params=load_checkpoint(str(ckpt)))

    def test_detects_the_real_fixtures(self, engines):
        """Balls found in frc_balls.png and the robot in red_robot.png,
        scored against the hand-labeled instance masks."""
        if not FIXTURES.exists():
            pytest.skip("reference fixtures unavailable")
        from tod_tpu.train.evaluate import disk_eval_scenes, evaluate_engines

        root = pathlib.Path(__file__).parent / "fixtures/real"
        m = evaluate_engines(
            *engines, hw=self.HW, scenes=disk_eval_scenes(str(root), self.HW, 2)
        )
        assert m["ap50_per_class"][3] >= 0.6, m   # the three balls
        assert m["det_recall_iou50"] >= 0.75, m
        assert m["map50"] >= 0.6, m
        # the robot: AP@.5 is brittle for a 1-object class, so gate on the
        # recall side too — SOME class-1 detection overlaps the labeled robot
        assert m["ap50_per_class"][1] is not None, m

    def test_robot_box_found_in_red_robot(self, engines):
        """Direct per-image gate: a class-1 detection overlaps the labeled
        robot box at IoU ≥ 0.3 (the robot is an open frame — box IoU is the
        right granularity for 'found')."""
        if not FIXTURES.exists():
            pytest.skip("reference fixtures unavailable")
        import json

        from tod_tpu.core.types import Frame
        from tod_tpu.train.evaluate import box_iou
        from tod_tpu.utils.image_io import load_image

        eng, _ = engines
        root = pathlib.Path(__file__).parent / "fixtures/real"
        spec = json.loads((root / "annotations.json").read_text())
        rec = [r for r in spec["images"] if "red_robot" in r["file"]][0]
        raw = load_image(rec["file"])
        ih, iw = raw.shape[:2]
        # nearest-resize to engine input (same loader path as the dataset)
        ys = (np.arange(self.HW[0]) * ih / self.HW[0]).astype(int)
        xs = (np.arange(self.HW[1]) * iw / self.HW[1]).astype(int)
        img = raw[ys][:, xs]
        ramp = np.linspace(3500, 600, self.HW[0]).astype(np.uint16)
        depth = np.broadcast_to(ramp[:, None], self.HW).copy()
        _, dets = eng.process(Frame(rgb=img, depth=depth))
        valid = np.asarray(dets.valid)
        boxes = np.asarray(dets.boxes)[valid]
        classes = np.asarray(dets.classes)[valid]
        y1, x1, y2, x2 = rec["objects"][0]["bbox"]
        gt = [y1 / ih, x1 / iw, y2 / ih, x2 / iw]
        ious = [box_iou(gt, b) for b in boxes[classes == 1]]
        assert ious and max(ious) >= 0.3, (ious, "robot not found")

    def test_red_robot_top_detection_is_the_robot(self, engines):
        """Score-ordering gate (round-4 v2 hard-negative fine-tune): on
        red_robot.png the TOP-scoring detection must be class 1 (red robot)
        and overlap the labeled box, and no other-class false positive may
        reach deployment confidence (0.75).  The pre-fine-tune campaign
        checkpoint failed exactly this — it ranked a hallucinated ball in
        the spectator crowd at 0.945 ABOVE the robot (0.749), because the
        v1 training clutter was always desaturated and saturation alone
        separated the classes (train/domainrand.py v2 docstring)."""
        if not FIXTURES.exists():
            pytest.skip("reference fixtures unavailable")
        import json

        from tod_tpu.core.types import Frame
        from tod_tpu.train.evaluate import box_iou
        from tod_tpu.utils.image_io import load_image

        eng, _ = engines
        root = pathlib.Path(__file__).parent / "fixtures/real"
        spec = json.loads((root / "annotations.json").read_text())
        rec = [r for r in spec["images"] if "red_robot" in r["file"]][0]
        raw = load_image(rec["file"])
        ih, iw = raw.shape[:2]
        ys = (np.arange(self.HW[0]) * ih / self.HW[0]).astype(int)
        xs = (np.arange(self.HW[1]) * iw / self.HW[1]).astype(int)
        img = raw[ys][:, xs]
        ramp = np.linspace(3500, 600, self.HW[0]).astype(np.uint16)
        depth = np.broadcast_to(ramp[:, None], self.HW).copy()
        _, dets = eng.process(Frame(rgb=img, depth=depth))
        valid = np.asarray(dets.valid)
        boxes = np.asarray(dets.boxes)[valid]
        classes = np.asarray(dets.classes)[valid]
        scores = np.asarray(dets.scores)[valid]
        order = np.argsort(-scores)
        y1, x1, y2, x2 = rec["objects"][0]["bbox"]
        gt = [y1 / ih, x1 / iw, y2 / ih, x2 / iw]
        top = order[0]
        assert classes[top] == 1, (
            f"top detection is cls={classes[top]} score={scores[top]:.3f}, "
            "not the red robot"
        )
        assert box_iou(gt, boxes[top]) >= 0.3
        fp_conf = scores[(classes != 1) & (scores >= 0.75)]
        assert fp_conf.size == 0, (
            f"{fp_conf.size} non-robot detections at deployment confidence "
            f"(max {fp_conf.max() if fp_conf.size else 0:.3f}) — crowd "
            "hallucinations are back"
        )

    @pytest.mark.slowgate
    def test_cross_domain_sim_map(self, engines):
        """mAP on sim-renderer scenes (a generator the trainer never saw):
        detection, not memorization of one distribution.  The bar is 0.75
        (raised from 0.5 in round 5, VERDICT r4 item 4: the measured value
        was 0.827→0.802 across rounds and a 0.5 bar would let it halve
        silently)."""
        from tod_tpu.train.evaluate import evaluate_engines, sim_eval_scenes

        m = evaluate_engines(
            *engines, hw=self.HW, scenes=sim_eval_scenes(self.HW, 6, seed=11)
        )
        assert m["map50"] is not None and m["map50"] >= 0.75, m
        assert m["det_recall_iou50"] >= 0.6, m

    @pytest.mark.slowgate
    def test_perturbation_robustness_on_real_fixtures(self, engines):
        """De-leaked real-image gate (VERDICT r4 item 4): the two reference
        photographs are also the images the round-4 fine-tune iterated
        against, so scoring only their exact pixel grids is selection
        pressure on the test set.  This gate scores 16 deterministic
        photometric/geometric variants (train/evaluate.py PERTURBATIONS —
        gamma, contrast, white-balance, noise, hflip, zoom in/out) that no
        training run ever optimized against, with the GT transformed
        alongside.  A model that memorized the fixtures fails here; the
        written protocol (checkpoints/README.md "Real-fixture evaluation
        protocol") forbids future training iterations from targeting these
        variants."""
        if not FIXTURES.exists():
            pytest.skip("reference fixtures unavailable")
        from tod_tpu.train.evaluate import (
            evaluate_engines,
            perturbed_fixture_scenes,
        )

        root = pathlib.Path(__file__).parent / "fixtures/real"
        m = evaluate_engines(
            *engines,
            hw=self.HW,
            scenes=perturbed_fixture_scenes(str(root), self.HW),
        )
        assert m["n_scenes"] == 16, m
        # recall under perturbation: the balls and the robot must still be
        # FOUND (IoU .3 — geometric variants legitimately blur box edges).
        # Measured at the freeze (pinned yolact_dr): recall@30 = 1.0,
        # recall@50 = 1.0, mAP@.5 = 1.0, ball AP@.5 = 1.0, mAP@[.5:.95]
        # 0.594 (box tightness degrades under perturbation — not gated).
        # Bars sit at 0.75-0.9 to absorb backend numeric drift only.
        assert m["det_recall_iou30"] >= 0.9, m
        assert m["det_recall_iou50"] >= 0.75, m
        assert m["map50"] is not None and m["map50"] >= 0.75, m
        assert m["ap50_per_class"][3] >= 0.75, m  # balls under perturbation

    @pytest.mark.slowgate
    def test_quality_holds_at_native_vga(self):
        """Quality at the reference's native 640×480 operating point
        (VERDICT r4 item 5; reference src/scene.rs:36-37): the VGA serving
        configs (bench 6/17) were recorded with a checkpoint only ever
        evaluated at 240×320.  Measured on the TPU (16 scenes): mAP@.5 = 1.0,
        recall@50 = 1.0, mAP@[.5:.95] = 0.871 — fully-convolutional transfer
        HOLDS for in-distribution object pixel scales.  (The 224×224 real
        fixtures UPSCALED to VGA fail — ~3× scale extrapolation; recorded in
        docs/performance.md, not gated: upscaled photos are not the VGA
        deployment input, native VGA camera frames are.)"""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_dr"
        if not ckpt.exists():
            pytest.skip("domain-randomized pinned checkpoint not present")
        from tod_tpu.train.evaluate import evaluate

        m = evaluate(str(ckpt), n_scenes=4, seed=9999, hw=(480, 640))
        assert m["map50"] >= 0.9, m
        assert m["det_recall_iou50"] >= 0.9, m

    @pytest.mark.slowgate
    def test_same_domain_gates_still_hold(self):
        """Pinning the domain-randomized checkpoint must not regress the
        procedural-domain quality bars the round-2/3 checkpoint set."""
        ckpt = pathlib.Path(__file__).parent.parent / "checkpoints/yolact_dr"
        if not ckpt.exists():
            pytest.skip("domain-randomized pinned checkpoint not present")
        from tod_tpu.train.evaluate import evaluate

        m = evaluate(str(ckpt), n_scenes=8, seed=9999)
        assert m["map50"] >= 0.9, m
        assert m["det_recall_iou50"] >= 0.8, m
        assert m["inst_mask_iou_mean"] >= 0.75, m
