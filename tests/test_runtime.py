"""Runtime tests: frame sources (incl. native ring + trace replay) and the
end-to-end engine loop on the CPU backend (SURVEY.md §4: fake frame source
standing in for OpenNI2; CPU-backend e2e)."""

import dataclasses

import numpy as np
import pytest

from tod_tpu.core.config import CameraConfig, GeometryConfig, ModelConfig, PipelineConfig, PlannerConfig
from tod_tpu.native import loader
from tod_tpu.runtime import Engine, RingSource, SyntheticSource, TraceSource, write_trace
from tod_tpu.runtime.classify import Classifier
from tod_tpu.runtime.frame_source import synth_frame_numpy
from tod_tpu.serve.server import PathStore

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


class TestFrameSources:
    def test_synthetic_deterministic(self):
        s1 = SyntheticSource(TINY_CAM, seed=3, n_frames=2)
        s2 = SyntheticSource(TINY_CAM, seed=3, n_frames=2)
        f1 = list(s1.frames())
        f2 = list(s2.frames())
        np.testing.assert_array_equal(f1[1].rgb, f2[1].rgb)
        np.testing.assert_array_equal(f1[1].depth, f2[1].depth)

    @pytest.mark.skipif(not loader.available(), reason="native lib unavailable")
    def test_native_matches_numpy_port(self):
        src = SyntheticSource(TINY_CAM, seed=5, n_frames=1)
        assert src._lib is not None, "native generator should be active"
        native = next(src.frames())
        py = synth_frame_numpy(5, 0, TINY_CAM.height, TINY_CAM.width)
        np.testing.assert_array_equal(native.rgb, py.rgb)
        np.testing.assert_array_equal(native.depth, py.depth)

    def test_trace_roundtrip(self, tmp_path):
        frames = list(SyntheticSource(TINY_CAM, seed=1, n_frames=3).frames())
        p = tmp_path / "t.todtrace"
        write_trace(p, frames)
        back = list(TraceSource(p).frames())
        assert len(back) == 3
        np.testing.assert_array_equal(back[2].rgb, frames[2].rgb)
        np.testing.assert_array_equal(back[2].depth, frames[2].depth)

    @pytest.mark.skipif(not loader.available(), reason="native lib unavailable")
    def test_ring_source_streams(self):
        src = RingSource(TINY_CAM, capacity=4, fps=200.0, seed=0, n_frames=5)
        try:
            got = list(src.frames())
            assert len(got) == 5
            assert got[0].rgb.shape == (48, 64, 3)
            assert src.stats["pushed"] >= 5
        finally:
            src.close()

    @pytest.mark.skipif(not loader.available(), reason="native lib unavailable")
    def test_ring_trace_replay(self, tmp_path):
        frames = list(SyntheticSource(TINY_CAM, seed=9, n_frames=2).frames())
        p = tmp_path / "r.todtrace"
        write_trace(p, frames)
        src = RingSource(TINY_CAM, capacity=4, fps=500.0, trace_path=str(p), n_frames=4)
        try:
            got = list(src.frames())
            assert len(got) == 4
            # drop-old ring at 500 fps: under load the consumer may miss
            # frames, so the loop-order check (got[2] == got[0]) only holds
            # when nothing was dropped; the unconditional invariant is that
            # every consumed frame IS one of the two trace frames
            trace = [f.rgb for f in frames]
            for g in got:
                assert any(np.array_equal(g.rgb, t) for t in trace)
            if src.stats["dropped"] == 0:
                np.testing.assert_array_equal(got[2].rgb, got[0].rgb)
        finally:
            src.close()


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        return Engine(TINY_CFG, mode="detect", use_pallas=False)

    def test_process_single_frame(self, engine):
        frame = next(SyntheticSource(TINY_CAM, n_frames=1).frames())
        scene, dets = engine.process(frame)
        assert scene.height.shape == (48, 64)
        assert scene.connections.shape == (48, 64, 8)
        assert dets.class_map.shape == (48, 64)

    def test_run_loop_with_planner_and_store(self, engine):
        store = PathStore()
        src = SyntheticSource(TINY_CAM, n_frames=3)
        metrics = engine.run(src, path_store=store, plan_paths=True)
        assert metrics["n_frames"] == 3
        assert metrics["fps"] > 0
        assert "plan" in metrics["stages"]

    def test_run_loop_paired_rtt_probes(self, engine):
        """probe_rtt=True pairs every sampled latency with a same-moment
        transport probe: the run records "rtt" and "latency_rtt_free" stages
        with one entry per latency sample, corrected values never exceed the
        raw ones, and the clamp-saturation counter is surfaced (the measured
        basis for latency claims — VERDICT r3 item 4 / ADVICE r3 items 1-2)."""
        engine.timer.reset()
        metrics = engine.run(
            SyntheticSource(TINY_CAM, n_frames=6), plan_paths=False,
            max_inflight=1, probe_rtt=True, warmup=False,
        )
        lat = engine.timer.stats("latency")
        rtt = engine.timer.stats("rtt")
        free = engine.timer.stats("latency_rtt_free")
        assert lat["n"] >= 1
        assert rtt["n"] == lat["n"] == free["n"]
        assert free["p50_ms"] <= lat["p50_ms"]
        assert rtt["min_ms"] >= 0.0
        assert isinstance(metrics["rtt_saturated"], int)

    def test_run_loop_no_probes_by_default(self, engine):
        engine.timer.reset()
        engine.run(
            SyntheticSource(TINY_CAM, n_frames=3), plan_paths=False, warmup=False
        )
        assert engine.timer.stats("rtt")["n"] == 0

    def test_run_loop_device_planner_mode(self):
        """Serving with the fully device-resident planner (backend="tpu"):
        the frame step returns (height, balls) device arrays and the planner
        worker dispatches plan_on_device, reading back only the direction
        list — the loop the TPU serving default ("auto" on a real chip)
        takes.  Runs on the CPU backend here (same graph, same semantics)."""
        cfg = dataclasses.replace(TINY_CFG, planner=PlannerConfig(backend="tpu"))
        eng = Engine(cfg, mode="semantic", use_pallas=False)
        assert eng._plan_on_device_mode
        store = PathStore()
        metrics = eng.run(
            SyntheticSource(TINY_CAM, n_frames=3), path_store=store, plan_paths=True
        )
        assert metrics["n_frames"] == 3
        assert metrics["plans_done"] >= 1
        # the store received a Path object (directions may be empty with
        # random weights — the contract is the plumbing, not the content)
        assert store.get() is not None

    def test_run_loop_fused_instream_planning(self):
        """The latency-bounded serving mode: device-planner backend with the
        FUSED frame+plan graph dispatched every plan_every frames
        (Engine._serve_step_plan) and a bounded dispatch queue.  Every
        plan_every-th dispatch returns the (max_steps+1, 2) plan buffer the
        worker materializes; staleness is bounded by plan_every, not the
        sync window."""
        cfg = dataclasses.replace(TINY_CFG, planner=PlannerConfig(backend="tpu"))
        eng = Engine(cfg, mode="semantic", use_pallas=False)
        store = PathStore()
        metrics = eng.run(
            SyntheticSource(TINY_CAM, n_frames=6),
            path_store=store,
            plan_paths=True,
            plan_every=2,
            max_inflight=2,
            sync_every=4,
        )
        assert metrics["n_frames"] == 6
        # frames 0, 2, 4 carry fused plans (drop-old worker may skip some,
        # but at least the final materialization must land)
        assert metrics["plans_done"] >= 1
        assert store.get() is not None

    def test_semantic_mode(self):
        eng = Engine(TINY_CFG, mode="semantic", use_pallas=False)
        frame = next(SyntheticSource(TINY_CAM, n_frames=1).frames())
        scene, dets = eng.process(frame)
        assert scene.height.shape == (48, 64)
        cls = np.asarray(dets.class_map)
        assert cls.max() <= 3


class TestClassifierParity:
    def test_packed_word_contract(self):
        clf = Classifier(TINY_CFG)
        h, w = TINY_CAM.height, TINY_CAM.width
        frame = next(SyntheticSource(TINY_CAM, n_frames=1).frames())
        from tod_tpu.ops.packing import pack_rgb_u32
        import jax.numpy as jnp

        words = np.asarray(pack_rgb_u32(jnp.asarray(frame.rgb)))
        out = clf.classify(words)
        assert out.shape == words.shape and out.dtype == np.uint32
        # low 16 bits always zero; class in byte 3 bounded by meaningful classes
        assert (out & 0xFFFF == 0).all()
        assert ((out >> 24) <= 3).all()


class TestWatchdog:
    def test_fires_on_stall_and_resets(self):
        import time as _t

        from tod_tpu.runtime.watchdog import Watchdog

        fired = []
        wd = Watchdog(timeout_s=0.2, on_stall=fired.append, check_interval_s=0.05)
        wd.start()
        try:
            _t.sleep(0.5)
            assert len(fired) == 1  # fires once per stall, not repeatedly
            wd.heartbeat()
            _t.sleep(0.1)
            assert len(fired) == 1
            _t.sleep(0.4)
            assert len(fired) == 2  # re-arms after a heartbeat
        finally:
            wd.stop()
