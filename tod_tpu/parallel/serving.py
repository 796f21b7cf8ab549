"""Multi-chip DP serving: shard a frame batch over the mesh's dp axis.

SURVEY.md §2.5 marks multi-chip as plain DP over ICI; round 2 only had it as a
unit-tested ``shard_inference`` wrapper that nothing reached.  This module is
the serving path: raw uint8 frames in → preprocess → YOLACT forward →
per-frame detection cleanup (``detect_batch``), the whole graph jit'd over the
mesh with the batch sharded on ``dp`` and params replicated.  XLA/GSPMD
partitions every conv along the batch; no collectives are needed in the
forward (pure DP), so ICI carries nothing and scaling is linear in chips.

Reachable from ``python -m tod_tpu.bench --config 9`` and equivalence-gated at
f32 ≤ 1e-6 against the unsharded graph in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tod_tpu.core.config import PipelineConfig
from tod_tpu.models.yolact import create_model, detect_batch
from tod_tpu.ops.preprocess import normalize, resize_triangle


class DPBatchServer:
    """DP-batched inference over a ('dp', 'tp') mesh.

    ``serve(rgb_batch)``: (B, H, W, 3) uint8 frames, B divisible by dp →
    batched ``Detections`` (leading axis B), computed with the batch sharded
    across the mesh's dp axis.  Params are replicated (inference has no
    gradient all-reduce, so replication is the bandwidth-free layout).
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        mesh: Mesh,
        params: Any = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.mesh = mesh
        mcfg = cfg.model
        self.model, self.anchors = create_model(mcfg)
        cam_hw = (cfg.camera.height, cfg.camera.width)
        if params is None:
            x0 = jnp.zeros((1, *mcfg.input_size, 3), jnp.dtype(mcfg.dtype))
            params = jax.jit(lambda k: self.model.init(k, x0, train=False))(
                jax.random.PRNGKey(seed)
            )
        model, anchors = self.model, self.anchors

        def _serve(p, rgb_b):
            x = normalize(
                resize_triangle(rgb_b, mcfg.input_size), jnp.dtype(mcfg.dtype)
            )
            out = model.apply(p, x, train=False)
            return detect_batch(out, mcfg, anchors, out_hw=cam_hw)

        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("dp"))
        self.params = jax.device_put(params, replicated)
        self._serve = jax.jit(
            _serve,
            in_shardings=(jax.tree.map(lambda _: replicated, self.params), batch_sh),
        )
        self._batch_sh = batch_sh

    @property
    def dp(self) -> int:
        return self.mesh.shape["dp"]

    def serve(self, rgb_batch):
        """Dispatch one dp-sharded batch; returns device-resident Detections."""
        b = rgb_batch.shape[0]
        if b % self.dp:
            raise ValueError(f"batch {b} not divisible by dp={self.dp}")
        # device_put the HOST array straight into the dp sharding: each shard
        # transfers to its own device.  (jnp.asarray first would commit the
        # whole batch to device 0 and pay an extra device-to-device reshard —
        # double transfer cost + a device-0 memory spike per call.)
        rgb_batch = jax.device_put(rgb_batch, self._batch_sh)
        return self._serve(self.params, rgb_batch)
