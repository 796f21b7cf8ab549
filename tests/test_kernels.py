"""Pallas kernels (interpret mode on CPU) vs their jnp oracles."""

import jax.numpy as jnp
import pytest
import numpy as np

from tod_tpu.core.config import CameraConfig, GeometryConfig
from tod_tpu.geometry.fusion import _dilate_peaks, occupancy_map
from tod_tpu.kernels.bump import dilate_peaks


CAM = CameraConfig(width=40, height=32)
GEOM = GeometryConfig(terrain_norm_const=3, bot_norm_const=5)


class TestBumpKernel:
    def test_variable_val_matches_jnp(self):
        rng = np.random.default_rng(0)
        h, w, L = 16, 24, 3
        ext = np.zeros((h + 2 * L, w + 2 * L), np.float32)
        ys = rng.integers(0, h + 2 * L, 30)
        xs = rng.integers(0, w + 2 * L, 30)
        ext[ys, xs] = rng.uniform(1, 30, 30)
        got = np.asarray(dilate_peaks(jnp.asarray(ext), L, 0.1, (h, w)))
        want = np.asarray(_dilate_peaks(jnp.asarray(ext), L, 0.1, (h, w)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_constant_val_matches_jnp(self):
        rng = np.random.default_rng(1)
        h, w, L = 16, 24, 5
        ext = np.zeros((h + 2 * L, w + 2 * L), np.float32)
        ys = rng.integers(0, h + 2 * L, 20)
        xs = rng.integers(0, w + 2 * L, 20)
        ext[ys, xs] = 100.0
        got = np.asarray(
            dilate_peaks(jnp.asarray(ext), L, 0.1, (h, w), constant_val=100.0)
        )
        want = np.asarray(_dilate_peaks(jnp.asarray(ext), L, 0.1, (h, w)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_occupancy_pallas_path_matches_jnp_path(self):
        rng = np.random.default_rng(7)
        h, w = CAM.height, CAM.width
        depth = rng.integers(200, 3500, (h, w)).astype(np.uint16)
        cls = np.zeros((h, w), np.uint8)
        cls[5:9, 6:10] = 1
        cls[12:14, 30:33] = 2
        a = np.asarray(occupancy_map(jnp.asarray(depth), jnp.asarray(cls), CAM, GEOM))
        b = np.asarray(
            occupancy_map(
                jnp.asarray(depth), jnp.asarray(cls), CAM, GEOM, use_pallas=True
            )
        )
        np.testing.assert_allclose(a, b, atol=1e-4)


class TestConnectionsKernel:
    def test_matches_jnp_oracle(self):
        import jax.numpy as jnp
        from tod_tpu.geometry.fusion import connection_weights as cw_jnp
        from tod_tpu.kernels.connections import connection_weights as cw_pl

        rng = np.random.default_rng(4)
        hm = rng.uniform(0, 80, (16, 24)).astype(np.float32)
        pos_a, conns_a = cw_jnp(jnp.asarray(hm))
        pos_b, conns_b = cw_pl(jnp.asarray(hm))
        np.testing.assert_allclose(np.asarray(pos_a), np.asarray(pos_b))
        np.testing.assert_allclose(
            np.asarray(conns_a), np.asarray(conns_b), atol=1e-5
        )


class TestStripBumpKernel:
    def test_strip_tiled_matches_jnp(self):
        from tod_tpu.kernels.bump import dilate_peaks_strips

        rng = np.random.default_rng(5)
        h, w, L = 32, 40, 3
        ext = np.zeros((h + 2 * L, w + 2 * L), np.float32)
        m = rng.random(ext.shape) < 0.08
        ext[m] = rng.uniform(1, 30, m.sum())
        got = np.asarray(
            dilate_peaks_strips(jnp.asarray(ext), L, 0.1, (h, w), strip_h=8)
        )
        want = np.asarray(_dilate_peaks(jnp.asarray(ext), L, 0.1, (h, w)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_rejects_unaligned_strips(self):
        from tod_tpu.kernels.bump import dilate_peaks_strips

        with pytest.raises(ValueError):
            dilate_peaks_strips(jnp.zeros((36, 44)), 2, 0.1, (30, 40), strip_h=8)


class TestBumpStripsOnHardware:
    def test_strips_exact_on_tpu(self):
        """Hardware gate for the roll-based strip kernel: compile and run on
        the real chip, bit-exact vs the jnp oracle (skipped off-TPU — the
        interpret-mode equivalents above cover CPU)."""
        import jax

        if jax.default_backend() != "tpu":
            pytest.skip("needs a real TPU")
        from tod_tpu.kernels.bump import dilate_peaks_strips

        rng = np.random.default_rng(0)
        h, w, L = 240, 320, 10
        ext = np.zeros((h + 2 * L, w + 2 * L), np.float32)
        iy = rng.integers(0, h + 2 * L, 3000)
        ix = rng.integers(0, w + 2 * L, 3000)
        ext[iy, ix] = rng.uniform(1, 100, 3000)
        got = np.asarray(
            dilate_peaks_strips(jnp.asarray(ext), L, 0.1, (h, w), strip_h=16, interpret=False)
        )
        want = np.asarray(_dilate_peaks(jnp.asarray(ext), L, 0.1, (h, w)))
        np.testing.assert_array_equal(got, want)
