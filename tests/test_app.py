"""App entry-point smoke test (the main()/manage() replacement)."""

import numpy as np

from tod_tpu.app import main


class TestApp:
    def test_synthetic_run_with_server(self, capsys, tmp_path):
        rc = main(
            [
                "--source", "synthetic",
                "--frames", "2",
                "--width", "64", "--height", "48",
                "--port", "0",
                "--planner", "numpy",
                "--metrics-json",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        import json

        metrics = json.loads(out)
        assert metrics["n_frames"] == 2
        assert metrics["fps"] > 0

    def test_pipeline_parallel_run_with_server(self, capsys):
        """--pipeline serves through the stage-split TwoStagePipeline (both
        stages on one CPU device here) with the TCP server attached."""
        rc = main(
            [
                "--source", "synthetic",
                "--pipeline",
                "--frames", "2",
                "--width", "64", "--height", "48",
                "--port", "0",
                "--metrics-json",
            ]
        )
        assert rc == 0
        import json

        out = capsys.readouterr().out.strip().splitlines()[-1]
        metrics = json.loads(out)
        assert metrics["n_frames"] == 2
        assert "stage1_device" in metrics

    def test_png_source_uses_reference_fixture(self, capsys):
        rc = main(
            [
                "--source", "png",
                "--image", "/root/reference/data/frc_balls.png",
                "--frames", "1",
                "--width", "64", "--height", "48",
                "--no-server",
                "--planner", "numpy",
                "--metrics-json",
            ]
        )
        assert rc == 0
