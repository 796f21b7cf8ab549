"""Frozen serving artifacts (tod_tpu/deploy.py).

The reference deploys a frozen tflite blob (data/FRC_model_edgetpu.tflite,
loaded at src/yolact.rs:18-20); our equivalent is the fused serving graph
exported to StableHLO with prepared params embedded.  These tests gate the
full loop: export → single-file round trip → bit-exact replay vs the live
Engine graph → artifact-only streaming with a TCP path server.
"""

import json

import jax

import numpy as np
import pytest

from tod_tpu import deploy
from tod_tpu.core.config import (
    CameraConfig,
    GeometryConfig,
    ModelConfig,
    PipelineConfig,
    PlannerConfig,
)
from tod_tpu.runtime import Engine, SyntheticSource
from tod_tpu.serve.server import PathStore

TINY_CAM = CameraConfig(width=64, height=48)


def tiny_cfg(backend: str) -> PipelineConfig:
    return PipelineConfig(
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
        planner=PlannerConfig(backend=backend),
    )


@pytest.fixture(scope="module")
def engine():
    return Engine(tiny_cfg("tpu"), mode="detect", seed=7)


def _packed_frame(seed: int = 0) -> np.ndarray:
    frame = next(SyntheticSource(TINY_CAM, seed=seed, n_frames=1).frames())
    h, w = TINY_CAM.height, TINY_CAM.width
    packed = np.empty((h * w * 5,), np.uint8)
    packed[: h * w * 3] = np.ascontiguousarray(frame.rgb, np.uint8).reshape(-1)
    packed[h * w * 3 :] = (
        np.ascontiguousarray(frame.depth, np.uint16).view(np.uint8).reshape(-1)
    )
    return packed


class TestExportRoundTrip:
    def test_plan_artifact_bit_exact(self, engine, tmp_path):
        """The deserialized frozen graph replays the live Engine's fused
        frame+plan graph bit-for-bit on the same platform."""
        packed = _packed_frame(3)
        ref = np.asarray(engine._serve_step_plan(engine.params, packed))
        exported, meta = deploy.export_engine(engine, mode="plan")
        p = tmp_path / "tiny.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))
        out = np.asarray(art.call(packed))
        np.testing.assert_array_equal(ref, out)

    def test_aot_artifact_boots_without_compile_and_matches(self, engine, tmp_path):
        """--aot embeds the serialized XLA executable: on the exporting
        machine the load takes the "aot" boot path (no StableHLO parse, no
        XLA compile) and replays the live graph bit-for-bit."""
        packed = _packed_frame(4)
        ref = np.asarray(engine._serve_step_plan(engine.params, packed))
        exported, meta = deploy.export_engine(engine, mode="plan")
        blob, aot_meta = deploy.build_aot(engine, mode="plan")
        p = tmp_path / "tiny_aot.todx"
        deploy.save_artifact(exported, meta, str(p), aot_blob=blob, aot_meta=aot_meta)
        art = deploy.ServingArtifact.load(str(p))
        # the loader probes the AOT executable and falls back when it cannot
        # execute on this host (XLA:CPU AOT reload has thunk gaps; the real
        # zero-compile boot is measured on the TPU by the boot benchmark) —
        # either way the artifact must replay the live graph bit-for-bit
        assert art.boot in ("aot", "jit")
        np.testing.assert_array_equal(ref, np.asarray(art.call(packed)))
        # a host with a different accelerator falls back to the portable path
        hdr = deploy.read_meta(str(p))
        assert hdr["aot"]["bytes"] > 0 and "device_kind" in hdr["aot"]
        import json as _json
        import struct as _struct

        raw = p.read_bytes()
        n = _struct.unpack("<Q", raw[6:14])[0]
        meta2 = _json.loads(raw[14 : 14 + n])
        meta2["aot"]["device_kind"] = "TPU v9999"
        hdr2 = _json.dumps(meta2).encode()
        p2 = tmp_path / "tiny_aot_mismatch.todx"
        p2.write_bytes(raw[:6] + _struct.pack("<Q", len(hdr2)) + hdr2 + raw[14 + n :])
        art2 = deploy.ServingArtifact.load(str(p2))
        assert art2.boot == "jit"
        np.testing.assert_array_equal(ref, np.asarray(art2.call(packed)))

    def test_track_plan_artifact_threads_bank_bit_exact(self, tmp_path):
        """Round 5: the TRACKED fused frame+plan graph freezes with the
        Kalman bank as an explicit input/output.  Two chained calls through
        the artifact must replay the live tracked engine bit-for-bit — plan
        buffers AND the evolved bank (temporal serving survives freezing)."""
        import dataclasses

        from tod_tpu.core.config import TrackerConfig

        cfg = dataclasses.replace(
            tiny_cfg("tpu"), tracker=TrackerConfig(enabled=True)
        )
        eng = Engine(cfg, mode="detect", seed=7, use_pallas=False)
        packed = _packed_frame(5)
        exported, meta = deploy.export_engine(eng, mode="track_plan")
        assert meta["mode"] == "track_plan"
        assert meta["tracker"]["max_tracks"] == cfg.tracker.max_tracks
        p = tmp_path / "tracked.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))

        bank_art = art.init_tracks()
        bank_ref = eng._init_tracks()
        import jax.numpy as jnp

        pk = jnp.asarray(packed)
        for step in range(2):
            plan_a, bank_art = art.call(pk, bank_art)
            # live engine: unjitted fn (the jitted one donates its bank)
            plan_r, bank_ref = eng._serve_step_track_plan_fn(
                eng.params, pk, bank_ref
            )
            np.testing.assert_array_equal(
                np.asarray(plan_a), np.asarray(plan_r), err_msg=f"plan {step}"
            )
            np.testing.assert_array_equal(
                np.asarray(bank_art), np.asarray(bank_ref), err_msg=f"bank {step}"
            )
        assert np.asarray(bank_art).any(), "bank never evolved"

    def test_track_plan_serve_artifact_and_artifact_engine(self, tmp_path):
        """The minimal deploy.serve loop AND the production ArtifactEngine
        both drive a track_plan artifact end-to-end (bank threaded through
        planning dispatches; off-cadence frames don't step the tracker)."""
        import dataclasses

        from tod_tpu.core.config import TrackerConfig
        from tod_tpu.runtime.artifact_engine import ArtifactEngine

        cfg = dataclasses.replace(
            tiny_cfg("tpu"), tracker=TrackerConfig(enabled=True)
        )
        eng = Engine(cfg, mode="detect", seed=7, use_pallas=False)
        exported, meta = deploy.export_engine(eng, mode="track_plan")
        p = tmp_path / "tracked.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))

        store = PathStore()
        m = deploy.serve_artifact(
            art, SyntheticSource(TINY_CAM, seed=1, n_frames=6),
            path_store=store, plan_every=2,
        )
        assert m["n_frames"] == 6 and m["plans_done"] >= 2

        aeng = ArtifactEngine(art)
        assert aeng.cfg.tracker.enabled
        m2 = aeng.run(
            SyntheticSource(TINY_CAM, seed=2, n_frames=6),
            path_store=PathStore(), plan_every=2, warmup=True,
        )
        assert m2["n_frames"] == 6 and m2["plans_done"] >= 2

    def test_format1_artifact_still_loads(self, engine, tmp_path):
        """Back-compat: a format-1 file (no payload_bytes — StableHLO to
        EOF) loads and runs through the portable path."""
        import json as _json
        import struct as _struct

        packed = _packed_frame(6)
        exported, meta = deploy.export_engine(engine, mode="plan")
        meta_v1 = {k: v for k, v in meta.items() if k != "payload_bytes"}
        meta_v1["format"] = 1
        hdr = _json.dumps(meta_v1).encode()
        p = tmp_path / "v1.todx"
        with open(p, "wb") as f:
            f.write(b"TODX1\n")
            f.write(_struct.pack("<Q", len(hdr)))
            f.write(hdr)
            f.write(bytes(exported.serialize()))
        art = deploy.ServingArtifact.load(str(p))
        assert art.boot == "jit"
        ref = np.asarray(engine._serve_step_plan(engine.params, packed))
        np.testing.assert_array_equal(ref, np.asarray(art.call(packed)))

    def test_packed_artifact_matches_engine(self, engine, tmp_path):
        packed = _packed_frame(5)
        ref = np.asarray(engine._serve_step_packed(engine.params, packed))
        exported, meta = deploy.export_engine(engine, mode="packed")
        p = tmp_path / "tiny_packed.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))
        out = np.asarray(art.call(packed))
        np.testing.assert_array_equal(ref, out)
        height, balls = art.unpack_scene(out)
        assert height.shape == (TINY_CAM.height, TINY_CAM.width)
        assert balls.shape[1] == 4

    def test_meta_header_readable_without_deserialize(self, engine, tmp_path):
        exported, meta = deploy.export_engine(engine, mode="plan")
        p = tmp_path / "m.todx"
        deploy.save_artifact(exported, meta, str(p))
        got = deploy.read_meta(str(p))
        assert got["mode"] == "plan"
        assert got["camera"] == {"height": 48, "width": 64}
        assert got["packed_input_bytes"] == 48 * 64 * 5
        assert got["planner"]["max_path_steps"] >= 1
        assert "cpu" in got["platforms"] or "tpu" in got["platforms"]

    def test_portable_multi_platform_export(self, engine, tmp_path):
        """A CPU host can freeze a ('cpu','tpu') artifact (use_pallas=False
        keeps the graph free of platform-specific custom calls) — build the
        deployment blob on a workstation, run it on the robot's TPU."""
        packed = _packed_frame(7)
        exported, meta = deploy.export_engine(
            engine, mode="plan", platforms=("cpu", "tpu")
        )
        assert set(meta["platforms"]) == {"cpu", "tpu"}
        p = tmp_path / "portable.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))
        ref = np.asarray(engine._serve_step_plan(engine.params, packed))
        np.testing.assert_array_equal(ref, np.asarray(art.call(packed)))

    def test_int8_artifact_freezes_static_quantized_graph(self, tmp_path):
        """The reference's deployed blob WAS its u8 graph — freezing the
        static-int8 serve step (prepared weights + calibrated scales baked
        as constants) is the strict deployment parity.  Bit-exact replay."""
        cfg = tiny_cfg("tpu")
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantized=True)
        )
        # quantized prepare needs a loaded (non-jit-init) tree: init one
        # engine for params, then construct the int8 engine from them
        base = Engine(tiny_cfg("tpu"), mode="detect", seed=7)
        eng = Engine(cfg, params=jax.tree.map(np.asarray, base.params), mode="detect")
        packed = _packed_frame(9)
        ref = np.asarray(eng._serve_step_plan(eng.params, packed))
        exported, meta = deploy.export_engine(eng, mode="plan")
        assert meta["model"]["quantized"] is True
        p = tmp_path / "int8.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))
        np.testing.assert_array_equal(ref, np.asarray(art.call(packed)))

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.todx"
        p.write_bytes(b"NOTTODX" + b"\x00" * 32)
        with pytest.raises(ValueError, match="bad magic"):
            deploy.read_meta(str(p))
        with pytest.raises(ValueError, match="bad magic"):
            deploy.ServingArtifact.load(str(p))

    def test_wrong_input_shape_rejected(self, engine, tmp_path):
        exported, meta = deploy.export_engine(engine, mode="plan")
        p = tmp_path / "s.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))
        with pytest.raises(ValueError, match="packed frame"):
            art.call(np.zeros((17,), np.uint8))


class TestArtifactServing:
    def test_serve_artifact_streams_and_plans(self, engine, tmp_path):
        """Artifact-only serving: synthetic frames stream through the frozen
        graph, fresh plans land in the PathStore."""
        exported, meta = deploy.export_engine(engine, mode="plan")
        p = tmp_path / "serve.todx"
        deploy.save_artifact(exported, meta, str(p))
        art = deploy.ServingArtifact.load(str(p))
        store = PathStore()
        metrics = deploy.serve_artifact(
            art,
            SyntheticSource(TINY_CAM, seed=1, n_frames=8),
            n_frames=8,
            path_store=store,
            plan_every=2,
            sync_every=4,
        )
        assert metrics["n_frames"] == 8
        # plan_every bounds path STALENESS, not just total count: plan frames
        # 0/2/4/6 each materialize (previous pending flushed when the next
        # plan frame dispatches, final one at stream end) — NOT the
        # sync_every cadence (which would give 2 here)
        assert metrics["plans_done"] == 4
        # the store carries a real Path object (possibly empty directions on
        # a scene with no reachable ball — planning still ran)
        assert store.get().created > 0

    def test_serve_honors_artifact_planner_semantics(self):
        """Host planning for scene/packed artifacts must use the EXPORTED
        planner semantics (signed turns, start column, caps) from the
        header — defaults would silently flip the angle convention."""
        meta = {
            "planner": {
                "signed_turns": True,
                "start_offset": 32,
                "max_seed_balls": 2,
                "max_path_steps": 512,
            }
        }
        pcfg = deploy.planner_config_from_meta(meta)
        assert pcfg.signed_turns is True
        assert pcfg.start_offset == 32
        assert pcfg.max_seed_balls == 2
        assert pcfg.max_path_steps == 512
        # headers from older artifacts (no planner block) fall back to defaults
        d = deploy.planner_config_from_meta({})
        assert d.signed_turns is False and d.start_offset == 240

    def test_cli_export_info_serve(self, tmp_path, capsys):
        """The three CLI verbs run end-to-end on the tiny shape."""
        out = tmp_path / "cli.todx"
        rc = deploy.main(
            [
                "export",
                "--out", str(out),
                "--width", "64",
                "--height", "48",
                "--checkpoint", "",  # force random init (no pinned load at tiny shape)
            ]
        )
        assert rc == 0 and out.exists()
        head = json.loads(capsys.readouterr().out)
        assert head["mode"] == "plan" and head["bytes"] == out.stat().st_size

        rc = deploy.main(["info", str(out)])
        assert rc == 0
        assert json.loads(capsys.readouterr().out)["camera"]["width"] == 64

        rc = deploy.main(
            ["serve", str(out), "--frames", "4", "--plan-every", "2", "--port", "0"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        metrics = json.loads(lines[-1])
        assert metrics["n_frames"] == 4
