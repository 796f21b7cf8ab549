"""Profiler + image IO utilities."""

import time

import pytest

import numpy as np

from tod_tpu.runtime.profiler import FPSMeter, StageTimer
from tod_tpu.utils.image_io import dump_scene_debug, load_image, save_gray_bmp


class TestProfiler:
    def test_stage_timer_stats(self):
        t = StageTimer()
        for ms in (10, 20, 30):
            t.record("x", ms / 1000)
        s = t.stats("x")
        assert s["n"] == 3
        assert s["p50_ms"] == 20.0
        assert s["max_ms"] == 30.0
        assert t.stats("missing") == {"n": 0}

    def test_stage_context(self):
        t = StageTimer()
        with t.stage("work"):
            time.sleep(0.01)
        assert t.stats("work")["mean_ms"] >= 9

    def test_fps_meter(self):
        m = FPSMeter()
        assert m.fps == 0.0
        for _ in range(3):
            m.tick()
            time.sleep(0.01)
        assert 30 < m.fps < 300


class TestImageIO:
    def test_bmp_roundtrip_truncating_cast(self, tmp_path):
        vals = np.array([[0.0, 255.9], [256.0, 1000.0]])
        p = tmp_path / "m.bmp"
        save_gray_bmp(p, vals)
        back = load_image(p)[..., 0]
        # reference semantics: `*i as u8` truncates (src/scene.rs:291)
        np.testing.assert_array_equal(back, [[0, 255], [0, 232]])

    def test_dump_scene_debug(self, tmp_path):
        from tod_tpu.core.types import empty_scene

        scene = empty_scene(8, 10)
        paths = dump_scene_debug(scene, tmp_path, depth=np.zeros((8, 10), np.uint16))
        assert len(paths) == 4
        for p in paths:
            assert load_image(p).shape == (8, 10, 3)


class TestTopLevelAPI:
    def test_lazy_headline_exports(self):
        """`tod_tpu.Engine` / `PathClient` / the data types resolve lazily
        (import tod_tpu must stay light for serving hosts) and unknown
        attributes raise AttributeError normally."""
        import tod_tpu

        assert tod_tpu.Path.__name__ == "Path"
        assert tod_tpu.PathClient.__module__ == "tod_tpu.serve.client"
        assert tod_tpu.Engine.__module__ == "tod_tpu.runtime.engine"
        assert "PathStore" in dir(tod_tpu)
        with pytest.raises(AttributeError):
            tod_tpu.not_a_symbol
