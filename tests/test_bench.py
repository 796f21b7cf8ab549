"""Benchmark/evaluator plumbing tests (the heavy runs are CLI-only; these pin
the registry contract and the pure helpers)."""

import numpy as np
import pytest

from tod_tpu.bench import CONFIGS
from tod_tpu.train.evaluate import box_iou


class TestBenchRegistry:
    def test_configs_registered(self):
        # 1-5 = BASELINE.json configs; 6 = VGA streaming (the reference's
        # native 640x480, src/scene.rs:36-37); 7 = batch throughput + MFU;
        # 8 = latency-bounded serving sweep; 9 = multi-chip DP serving;
        # 10 = int8 vs bf16 serve step; 11 = train-step throughput;
        # 12 = wall-clock chunked-training throughput; 13 = static-int8
        # batch throughput (config 7's quantized counterpart); 14 = batch-
        # scaling capacity curve; 15 = backbone-family throughput;
        # 16 = multi-stream serving (N camera feeds, one batched graph);
        # 17 = latency-bounded serving at VGA (the reference's native
        # resolution); 18 = pipeline-parallel (stage-split) serving vs fused;
        # 19 = tracked serving (track bank + obstacle memory step deltas)
        assert sorted(CONFIGS) == list(range(1, 20))
        for fn in CONFIGS.values():
            assert callable(fn) and fn.__doc__

    def test_cli_rejects_bad_config(self):
        from tod_tpu.bench.__main__ import main

        with pytest.raises(SystemExit):
            main(["--config", "99"])

    def test_config14_batch_scaling_cpu(self):
        from tod_tpu.bench.configs import config14_batch_scaling

        out = config14_batch_scaling()
        assert out["value"] > 0
        assert [c["batch"] for c in out["curve"]] == [1, 2]
        assert all(c["step_ms"] > 0 for c in out["curve"])

    def test_config15_backbone_family_cpu(self):
        from tod_tpu.bench.configs import config15_backbone_family

        out = config15_backbone_family()
        assert [c["backbone"] for c in out["curve"]] == [
            "mobilenetv2", "resnet18", "resnet50",
        ]
        assert all(c["images_per_s"] > 0 for c in out["curve"])

    def test_config11_train_throughput_cpu(self):
        from tod_tpu.bench.configs import config11_train_throughput

        out = config11_train_throughput()
        assert out["value"] > 0 and out["step_ms"] > 0
        assert out["unit"] == "steps/s"
        assert out["scaling"] == []  # larger-batch points are TPU-only

    def test_peak_flops_table(self):
        from tod_tpu.bench.mfu import peak_flops

        # v5p must NOT fall into the v5e bucket (ADVICE r2: ~2.3x MFU error)
        assert peak_flops("TPU v5 lite") == 197e12
        assert peak_flops("TPU v5p") == 459e12
        assert peak_flops("TPU v5p", "int8") == 918e12
        assert peak_flops("TPU v4") == 275e12
        assert peak_flops("TPU v6e", "int8") == 1836e12
        assert peak_flops("Quantum X100") is None


class TestBoxIoU:
    def test_identity(self):
        assert box_iou([0, 0, 1, 1], [0, 0, 1, 1]) == pytest.approx(1.0)

    def test_disjoint(self):
        assert box_iou([0, 0, 0.4, 0.4], [0.5, 0.5, 1, 1]) == 0.0

    def test_half_overlap(self):
        # [0,0,1,2] vs [0,1,1,2]: inter 1, union 2
        assert box_iou([0, 0, 1, 2], [0, 1, 1, 2]) == pytest.approx(0.5)

    def test_degenerate_box(self):
        assert box_iou([0, 0, 0, 0], [0, 0, 1, 1]) == 0.0


class TestAveragePrecision:
    """Hand-computed AP / matching cases for the evaluator's mAP path."""

    def test_perfect(self):
        from tod_tpu.train.evaluate import average_precision

        assert average_precision([0.9, 0.8], [True, True], 2) == pytest.approx(1.0)

    def test_textbook_case(self):
        # ranked TP/FP/TP with 2 GT: AP = 1.0·0.5 + (2/3)·0.5 = 5/6
        from tod_tpu.train.evaluate import average_precision

        ap = average_precision([0.9, 0.8, 0.7], [True, False, True], 2)
        assert ap == pytest.approx(5 / 6)

    def test_order_independent_input(self):
        # the function ranks by score itself; shuffled input gives the same AP
        from tod_tpu.train.evaluate import average_precision

        ap = average_precision([0.7, 0.9, 0.8], [True, True, False], 2)
        assert ap == pytest.approx(5 / 6)

    def test_missed_gt_caps_recall(self):
        # one TP but 2 GT: AP = 1.0·0.5 (recall never reaches 1)
        from tod_tpu.train.evaluate import average_precision

        assert average_precision([0.9], [True], 2) == pytest.approx(0.5)

    def test_edge_cases(self):
        from tod_tpu.train.evaluate import average_precision

        assert average_precision([], [], 0) is None  # no GT: undefined
        assert average_precision([], [], 3) == 0.0  # GT but no detections

    def test_greedy_match_duplicates_are_fp(self):
        import numpy as np

        from tod_tpu.train.evaluate import _greedy_match

        # two detections on one GT: only the higher-scoring one is a TP
        mat = np.array([[0.6], [0.8]])
        tp = _greedy_match(mat, [0.9, 0.5], thr=0.5)
        assert tp.tolist() == [True, False]

    def test_greedy_match_threshold(self):
        import numpy as np

        from tod_tpu.train.evaluate import _greedy_match

        tp = _greedy_match(np.array([[0.4]]), [0.9], thr=0.5)
        assert tp.tolist() == [False]


class TestEvaluatorFastPath:
    def test_evaluate_tiny_runs(self, tmp_path):
        # end-to-end evaluator on a tiny model + fresh checkpoint: exercises
        # checkpoint IO, both engine modes, and the metric aggregation
        import dataclasses

        from tod_tpu.core.config import ModelConfig, TrainConfig
        from tod_tpu.train import Trainer
        from tod_tpu.train.evaluate import evaluate

        hw = (48, 64)
        mcfg = dataclasses.replace(
            ModelConfig(input_size=hw),
            fpn_channels=16, proto_channels=16, head_channels=16,
            width_mult=0.35, num_prototypes=8, nms_top_k=8, max_detections=4,
        )
        trainer = Trainer(mcfg, TrainConfig(batch_size=1, total_steps=1))
        ckpt = tmp_path / "ck"
        trainer.save(str(ckpt))
        out = evaluate(str(ckpt), n_scenes=1, seed=5, hw=hw, mcfg=mcfg)
        assert set(out["sem_iou"]) == {1, 2, 3}
        assert 0 <= out["detections_per_gt"]
        assert 0.0 <= out["det_recall_iou50"] <= 1.0
        assert set(out["ap50_per_class"]) == {1, 2, 3}
        for key in ("map50", "map50_95"):
            assert out[key] is None or 0.0 <= out[key] <= 1.0


class TestProfilingParser:
    def test_category_mapping(self):
        from tod_tpu.bench.profiling import _category

        assert _category("%fusion.2 = bf16[16,2,2,4] fusion(...)") == "fusion"
        assert (
            _category("%convolution_convert_fusion = bf16[1] fusion(...)")
            == "convolution"
        )
        # "convert" must NOT be mistaken for a convolution ("conv" substring)
        assert (
            _category("%clamp_convert_fusion.17 = bf16[1] fusion(...)")
            == "clamp_convert_fusion"
        )
        assert _category("%convolution.5 = f32[1] convolution(...)") == "convolution"
        assert _category("%copy.32 = bf16[1] copy(...)") == "copy"
        assert (
            _category("%dynamic-update-slice.1 = f32[1] dynamic-update-slice(...)")
            == "dynamic-update-slice"
        )
