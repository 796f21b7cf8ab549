"""Multi-stream serving tests (runtime/multistream.py).

Equivalence: the batched N-stream graph must produce the same scenes and
plans as the single-stream Engine run per stream (same params, f32).  Plus
the stream-feed drop-old semantics and the GetPthN/NewPthN wire extension.
"""

import dataclasses
import struct

import numpy as np
import pytest

from tod_tpu.core.config import CameraConfig, ModelConfig, PipelineConfig, ServerConfig
from tod_tpu.core.types import Path
from tod_tpu.runtime.frame_source import SyntheticSource
from tod_tpu.runtime.multistream import MultiStreamEngine, _StreamFeed
from tod_tpu.serve.client import PathClient
from tod_tpu.serve.server import PathStore, run_in_thread, stop_thread_server

TINY = ModelConfig(
    input_size=(48, 64),
    fpn_channels=16,
    proto_channels=16,
    head_channels=16,
    width_mult=0.35,
    num_prototypes=8,
    dtype="float32",
)
CAM = CameraConfig(width=64, height=48)
CFG = PipelineConfig(camera=CAM, model=TINY)


def _pack(frame) -> np.ndarray:
    """The flat [rgb bytes][depth LE bytes] frame contract."""
    h, w = frame.depth.shape
    packed = np.empty((h * w * 5,), np.uint8)
    packed[: h * w * 3] = np.ascontiguousarray(frame.rgb, np.uint8).reshape(-1)
    packed[h * w * 3 :] = (
        np.ascontiguousarray(frame.depth, "<u2").view(np.uint8).reshape(-1)
    )
    return packed


class TestBatchedEquivalence:
    def test_scenes_and_plans_match_single_stream_engine(self):
        """Two streams with different synthetic scenes through the batched
        graph == the single-stream Engine's device-planner path per stream."""
        import jax

        from tod_tpu.runtime.engine import Engine

        eng = Engine(CFG, mode="detect", use_pallas=False, seed=0)
        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        # identical init seed → identical params
        for a, b in zip(jax.tree.leaves(eng.params), jax.tree.leaves(ms.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        frames = [
            next(SyntheticSource(CAM, seed=s, n_frames=1).frames()) for s in (3, 11)
        ]
        batch = np.stack([_pack(f) for f in frames])

        # scenes: per-sample identical math (batched fusion is a vmap)
        scenes, _ = ms._scenes(ms.params, batch)
        plans = np.asarray(ms._serve_plan_batch(ms.params, batch))
        for i, frame in enumerate(frames):
            import jax.numpy as jnp

            h_single, balls_single = eng._serve_step_scene(
                eng.params, jnp.asarray(_pack(frame))
            )
            h_b = np.asarray(scenes.height[i], np.float32)
            np.testing.assert_allclose(
                h_b, np.asarray(h_single, np.float32), atol=1e-4, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(scenes.balls[i]),
                np.asarray(balls_single),
                atol=1e-3,
                err_msg=f"stream {i} ball slots",
            )
            # plans: same n_valid and same total path cost (the path itself
            # may tie-break differently across separately-compiled programs)
            plan_single = np.asarray(eng._serve_step_plan(eng.params, jnp.asarray(_pack(frame))))
            assert int(plans[i, 0, 0]) == int(plan_single[0, 0]), f"stream {i} n_valid"
            np.testing.assert_allclose(
                plans[i, 1:, 0].sum(),
                plan_single[1:, 0].sum(),
                rtol=1e-3,
                err_msg=f"stream {i} total plan cost",
            )

    def test_tracked_banks_match_single_stream_tracked_engine(self):
        """Per-stream Kalman banks (round 5): the batched tracked graph's
        plan and updated bank for each stream must match the single-stream
        tracked Engine fed the same frame from the same initial bank —
        tracking in multistream is a vmap of the Engine's tracked step, not
        a reimplementation (VERDICT r4 item 2)."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from tod_tpu.core.config import PlannerConfig, TrackerConfig
        from tod_tpu.runtime.engine import Engine

        cfg = dc.replace(
            CFG,
            planner=PlannerConfig(backend="tpu"),
            tracker=TrackerConfig(enabled=True),
        )
        eng = Engine(cfg, mode="detect", use_pallas=False, seed=0)
        ms = MultiStreamEngine(cfg, n_streams=2, seed=0)
        assert ms.tracked
        frames = [
            next(SyntheticSource(CAM, seed=s, n_frames=1).frames()) for s in (3, 11)
        ]
        batch = np.stack([_pack(f) for f in frames])
        bank = np.asarray(ms._init_track_bank())
        # two consecutive ticks so the banks actually evolve (hit + predict)
        plans1, bank1 = ms._serve_plan_batch_track(
            ms.params, jnp.asarray(batch), jnp.asarray(bank.copy())
        )
        plans2, bank2 = ms._serve_plan_batch_track(
            ms.params, jnp.asarray(batch), bank1
        )
        plans2, bank2 = np.asarray(plans2), np.asarray(bank2)
        for i, frame in enumerate(frames):
            tr = jnp.asarray(bank[i].copy())
            for plan_s, _ in [(None, 0), (None, 1)]:
                plan_s, tr = eng._serve_step_track_plan(
                    eng.params, jnp.asarray(_pack(frame)), tr
                )
            np.testing.assert_allclose(
                bank2[i], np.asarray(tr), atol=1e-4, rtol=1e-4,
                err_msg=f"stream {i} track bank",
            )
            plan_s = np.asarray(plan_s)
            assert int(plans2[i, 0, 0]) == int(plan_s[0, 0]), f"stream {i} n_valid"
            np.testing.assert_allclose(
                plans2[i, 1:, 0].sum(), plan_s[1:, 0].sum(), rtol=1e-3,
                err_msg=f"stream {i} tracked plan cost",
            )

    def test_run_loop_serves_all_streams(self):
        """Three live streams → every store receives a path; per-stream paths
        reflect per-stream scenes (distinct seeds → distinct ball layouts)."""
        ms = MultiStreamEngine(CFG, n_streams=3, seed=0)
        sources = [SyntheticSource(CAM, seed=s, n_frames=6) for s in (3, 11, 27)]
        stores = [PathStore() for _ in sources]
        import time

        t0 = time.time()
        m = ms.run(sources, n_ticks=6, path_stores=stores, max_inflight=2)
        assert m["n_ticks"] >= 1
        assert m["n_streams"] == 3
        assert m["plans_done"] >= 3  # at least one fanout of 3 paths
        assert m["fresh_frames"] >= 3
        # every store received a freshly-planned path during the run (the
        # random-init tiny model detects no balls, so the PATHS are empty —
        # per-stream content fan-out is gated in test_fanout_routes_per_stream)
        assert all(s.get().created >= t0 for s in stores)

    def test_fanout_routes_per_stream(self):
        """_PlanFanout: one (N, S+1, 2) buffer → N distinct per-stream
        paths in the right stores."""
        from tod_tpu.runtime.multistream import _PlanFanout

        ms = MultiStreamEngine(CFG, n_streams=3, seed=0)
        stores = [PathStore() for _ in range(3)]
        fanout = _PlanFanout(ms, stores)
        bufs = np.zeros((3, 5, 2), np.float32)
        for i in range(3):
            bufs[i, 0, 0] = i + 1  # n_valid = 1, 2, 3
            bufs[i, 1 : 2 + i, 0] = float(10 * (i + 1))  # distinct magnitudes
        import time

        fanout.submit(bufs, time.perf_counter())
        fanout.finish()
        assert fanout.n_planned == 3
        for i in range(3):
            dirs = stores[i].get().directions
            assert len(dirs) == i + 1
            assert dirs[0][0] == pytest.approx(10.0 * (i + 1))

    def test_dead_at_birth_stream_degrades_to_black_frame(self):
        """A source that dies before its first frame (unplugged camera at
        boot) must not wedge the other streams: the rig keeps ticking with
        an all-zeros substitute frame for the dead slot (black image → empty
        plan) while the live streams serve normally."""

        class _DeadSource:
            def frames(self):
                return iter(())

            def close(self):
                pass

        import time

        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        sources = [SyntheticSource(CAM, seed=3, n_frames=4), _DeadSource()]
        stores = [PathStore(), PathStore()]
        t0 = time.time()
        m = ms.run(sources, n_ticks=4, path_stores=stores, max_inflight=2)
        assert m["n_ticks"] >= 1  # the live stream kept the rig ticking
        assert m["fresh_frames"] >= 1
        # both stores received freshly-planned paths; the dead stream's is
        # the black-frame empty plan
        assert stores[0].get().created >= t0
        assert stores[1].get().created >= t0
        assert stores[1].get().directions == []

    def test_stream_count_validation(self):
        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        with pytest.raises(ValueError):
            ms.run([SyntheticSource(CAM, seed=1, n_frames=1)], n_ticks=1)
        with pytest.raises(ValueError):
            ms.process(np.zeros((3, 48 * 64 * 5), np.uint8))
        with pytest.raises(ValueError):
            MultiStreamEngine(CFG, n_streams=0)


class TestSupervision:
    class _WedgingSource:
        """Yields one frame then blocks inside the read until close()."""

        def __init__(self, frame):
            import threading

            self._frame = frame
            self._ev = threading.Event()

        def frames(self):
            yield self._frame
            self._ev.wait()  # wedged camera: blocked mid-read until close()

        def close(self):
            self._ev.set()

    def test_wedged_stream_restarts_and_recovers(self):
        """Stream B wedges after one frame; the per-stream watchdog must
        close it, re-open from the factory, and keep the rig serving —
        stream A never notices."""
        from tod_tpu.runtime.frame_source import PacedSource

        frame_b = next(SyntheticSource(CAM, seed=11, n_frames=1).frames())
        calls = {"n": 0}

        def factory_b():
            calls["n"] += 1
            if calls["n"] == 1:
                return self._WedgingSource(frame_b)
            return SyntheticSource(CAM, seed=11, n_frames=500)

        def factory_a():
            return PacedSource(
                SyntheticSource(CAM, seed=3, n_frames=500), fps=40.0
            )

        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        stores = [PathStore(), PathStore()]
        m = ms.run_supervised(
            [factory_a, factory_b],
            n_ticks=40,
            path_stores=stores,
            stall_timeout_s=0.3,
            max_restarts=2,
            gather_timeout_s=20.0,  # load-robust: see test_dying_source_restarts
        )
        assert m["restarts"] >= 1  # the wedged source was recovered
        assert calls["n"] >= 2  # ...by re-opening from its factory
        assert m["n_ticks"] >= 10  # stream A kept the rig ticking throughout
        assert all(s.get().created > 0 for s in stores)

    def test_rig_wide_wedge_recovers_without_timeout_override(self):
        """ALL streams wedge simultaneously (shared USB hub reset — the rig
        failure mode, VERDICT r3 missing #3) and the run must RECOVER using
        the production configuration: no manual gather_timeout_s override —
        run_supervised itself must derive a gather window that outlasts
        stall detection + source reopen."""
        from tod_tpu.runtime.frame_source import PacedSource

        calls = {0: 0, 1: 0}

        def make_factory(i):
            frame = next(SyntheticSource(CAM, seed=3 + 8 * i, n_frames=1).frames())

            def factory():
                calls[i] += 1
                if calls[i] == 1:
                    return self._WedgingSource(frame)
                return PacedSource(
                    SyntheticSource(CAM, seed=3 + 8 * i, n_frames=500), fps=50.0
                )

            return factory

        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        stores = [PathStore(), PathStore()]
        m = ms.run_supervised(
            [make_factory(0), make_factory(1)],
            n_ticks=8,
            path_stores=stores,
            stall_timeout_s=0.5,
            max_restarts=2,
        )
        assert m["restarts"] >= 2, m  # BOTH wedged streams were recovered
        assert calls[0] >= 2 and calls[1] >= 2
        assert m["n_ticks"] >= 2, m  # the rig served again after the wedge

    def test_supervised_gather_floor_derivation(self):
        """run_supervised floors gather_timeout_s at stall + kick + grace and
        keeps caller values only when larger."""
        from tod_tpu.runtime.multistream import _RESTART_GRACE_S

        seen = {}
        ms = MultiStreamEngine(CFG, n_streams=1, seed=0)

        def spy(_feeds_factory, **kw):
            seen.update(kw)
            ms._supervised_feeds = ()
            return {"n_ticks": 0}

        ms._drive = spy
        floor = 0.5 + min(0.5 / 4, 0.25) + _RESTART_GRACE_S
        ms.run_supervised(
            [lambda: SyntheticSource(CAM, seed=3, n_frames=1)],
            stall_timeout_s=0.5,
        )
        assert seen["gather_timeout_s"] == pytest.approx(floor)
        ms.run_supervised(
            [lambda: SyntheticSource(CAM, seed=3, n_frames=1)],
            stall_timeout_s=0.5,
            gather_timeout_s=99.0,  # larger than the floor → kept
        )
        assert seen["gather_timeout_s"] == 99.0
        ms.run_supervised(
            [lambda: SyntheticSource(CAM, seed=3, n_frames=1)],
            stall_timeout_s=0.5,
            gather_timeout_s=0.1,  # below the floor → floored
        )
        assert seen["gather_timeout_s"] == pytest.approx(floor)

    def test_restarts_reset_between_supervised_runs(self):
        """ADVICE r3: a new run_supervised must report 0 restarts during its
        warmup window, not the previous run's counts."""
        ms = MultiStreamEngine(CFG, n_streams=1, seed=0)

        class _FakeFeed:
            restarts = 7
        ms._supervised_feeds = (_FakeFeed(),)
        assert ms.restarts == 7

        def spy(feeds_factory, **kw):
            # _drive resolves feeds only after warmup; the property must
            # already read 0 before that happens
            assert ms.restarts == 0
            return {"n_ticks": 0}

        ms._drive = spy
        m = ms.run_supervised(
            [lambda: SyntheticSource(CAM, seed=3, n_frames=1)],
            stall_timeout_s=0.5,
        )
        assert m["restarts"] == 0

    def test_clean_exhaustion_does_not_restart(self):
        """Finite sources that simply END are not failures: no restarts
        (same policy as Engine.run_supervised — restart on stall only)."""
        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        m = ms.run_supervised(
            [lambda: SyntheticSource(CAM, seed=3, n_frames=3),
             lambda: SyntheticSource(CAM, seed=11, n_frames=3)],
            n_ticks=10,
            stall_timeout_s=0.5,
            max_restarts=3,
        )
        assert m["restarts"] == 0
        assert m["n_ticks"] >= 1

    def test_dying_source_restarts(self):
        """A source whose frames() RAISES mid-stream (USB error) is
        re-opened from its factory."""
        calls = {"n": 0}

        from tod_tpu.runtime.frame_source import PacedSource

        def factory():
            calls["n"] += 1

            class _Dying:
                def frames(self, _n=calls["n"]):
                    # paced: keeps frames arriving across several ticks so
                    # the post-recovery loop demonstrably serves again
                    src = PacedSource(
                        SyntheticSource(CAM, seed=3, n_frames=500), fps=50.0
                    )
                    for i, f in enumerate(src.frames()):
                        if _n == 1 and i == 1:
                            raise OSError("camera gone")
                        yield f

                def close(self):
                    pass

            return _Dying()

        ms = MultiStreamEngine(CFG, n_streams=1, seed=0)
        # gather_timeout_s well above the default 2 s: on a CPU-starved host
        # (e.g. the suite sharing the core with a bench run) the restart can
        # take longer than a serving-default tick timeout, and the drive loop
        # declaring the rig exhausted before the recovered source produces
        # would flake the restart assertion.
        m = ms.run_supervised(
            [factory], n_ticks=8, stall_timeout_s=5.0, max_restarts=3,
            gather_timeout_s=20.0,
        )
        assert m["restarts"] >= 1
        assert calls["n"] >= 2
        assert m["n_ticks"] >= 2  # kept serving after the recovery

    def test_run_supervised_validates_counts(self):
        ms = MultiStreamEngine(CFG, n_streams=2, seed=0)
        with pytest.raises(ValueError):
            ms.run_supervised([lambda: SyntheticSource(CAM)], n_ticks=1)
        with pytest.raises(ValueError):
            ms.run_supervised(
                [lambda: SyntheticSource(CAM)] * 2,
                n_ticks=1,
                path_stores=[PathStore()],
            )


class TestStreamFeed:
    class _ListSource:
        def __init__(self, frames):
            self._frames = frames

        def frames(self):
            yield from self._frames

        def close(self):
            pass

    def test_drop_old_and_fresh_flags(self):
        frames = [next(SyntheticSource(CAM, seed=s, n_frames=1).frames()) for s in (1, 2, 3)]
        feed = _StreamFeed(self._ListSource(frames))
        # wait for the reader thread to drain all three frames
        import time

        deadline = time.time() + 5
        while not feed.done and time.time() < deadline:
            time.sleep(0.005)
        assert feed.done and feed.has_frame and feed.has_fresh
        buf, fresh = feed.take()
        assert fresh == 1
        np.testing.assert_array_equal(buf, _pack(frames[-1]))  # latest wins
        # nothing new: held frame, fresh=0
        assert not feed.has_fresh
        buf2, fresh2 = feed.take()
        assert fresh2 == 0
        np.testing.assert_array_equal(buf2, buf)
        feed.close()


class TestPacedSource:
    def test_paces_to_fps_without_skipping(self):
        import time

        from tod_tpu.runtime.frame_source import PacedSource

        src = PacedSource(SyntheticSource(CAM, seed=1, n_frames=5), fps=50.0)
        t0 = time.monotonic()
        frames = list(src.frames())
        elapsed = time.monotonic() - t0
        assert len(frames) == 5  # rate limit drops nothing
        # 5 frames at 50 FPS: first immediate, 4 waits of 20 ms ≥ 80 ms
        assert elapsed >= 0.95 * 4 * 0.02
        with pytest.raises(ValueError):
            PacedSource(SyntheticSource(CAM), fps=0)


class TestStreamProtocol:
    @pytest.fixture()
    def multi_server(self):
        stores = [PathStore() for _ in range(3)]
        t, srv = run_in_thread(
            stores[0], ServerConfig(port=0), stream_stores=stores
        )
        yield stores, srv
        stop_thread_server(srv)
        t.join(timeout=5)

    def test_getpthn_per_stream(self, multi_server):
        stores, srv = multi_server
        for i, s in enumerate(stores):
            s.set(Path(created=1700000000.0 + i, directions=[(float(i), 0.5)]))
        with PathClient(port=srv.port) as c:
            for i in range(3):
                p = c.get_path_stream(i)
                assert p.directions == [(float(i), 0.5)]
            # legacy single-store commands keep serving stream 0
            assert c.get_path().directions == [(0.0, 0.5)]

    def test_newpthn_resets_only_that_stream(self, multi_server):
        stores, srv = multi_server
        for i, s in enumerate(stores):
            s.set(Path(created=1.0, directions=[(float(i) + 1.0, 0.0)]))
        with PathClient(port=srv.port) as c:
            assert c.new_path_stream(1)
        assert stores[1].get().directions == []
        assert stores[0].get().directions == [(1.0, 0.0)]
        assert stores[2].get().directions == [(3.0, 0.0)]

    def test_out_of_range_stream_drops_connection(self, multi_server):
        stores, srv = multi_server
        import socket

        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as sk:
            sk.sendall(b"GetPthN" + struct.pack(">I", 99))
            assert sk.recv(64) == b""  # server dropped us (RequestError policy)
        assert srv.counters["errors"] >= 1

    def test_stats_reports_streams(self, multi_server):
        stores, srv = multi_server
        stores[2].set(Path(created=1.0, directions=[(1.0, 2.0)]))
        with PathClient(port=srv.port) as c:
            st = c.get_stats()
        assert len(st["streams"]) == 3
        assert st["streams"][2]["path_len"] == 1
