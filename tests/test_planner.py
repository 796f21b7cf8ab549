"""Planner tests: three backends agree; paths descend cost monotonically."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.core.config import PlannerConfig
from tod_tpu.core.types import NEIGHBOR_OFFSETS, Scene
from tod_tpu.geometry.fusion import connection_weights
from tod_tpu.planner import bellman_ford_grid, dijkstra_grid
from tod_tpu.planner.api import plan
from tod_tpu.planner.dijkstra import extract_directions, seeds_from_balls, start_node_yx
from tod_tpu.native import loader


def _scene_from_height(hm: np.ndarray, ball_yx=(2, 3), count=5.0) -> Scene:
    pos, conns = connection_weights(jnp.asarray(hm))
    balls = np.zeros((100, 4), np.float32)
    balls[0] = [ball_yx[1], ball_yx[0], count, 0]  # (x, y, count, 0)
    return Scene(
        height=hm.astype(np.float32),
        pos=np.asarray(pos),
        balls=balls,
        connections=np.asarray(conns),
    )


@pytest.fixture(scope="module")
def wall_scene():
    """Flat floor with a tall wall splitting the grid, one gap at the top."""
    hm = np.zeros((12, 16), np.float32)
    hm[2:, 8] = 100.0  # wall column with gap at rows 0-1
    return _scene_from_height(hm, ball_yx=(6, 12))


class TestDijkstra:
    def test_flat_grid_distance_is_euclidean_chain(self):
        hm = np.zeros((8, 8), np.float32)
        _, conns = connection_weights(jnp.asarray(hm))
        dist, parent = dijkstra_grid(hm, np.asarray(conns), [(0, 0)])
        # straight E path: each hop costs 1
        assert dist[0, 5] == pytest.approx(5.0)
        # diagonal path: each hop costs sqrt(2)
        assert dist[5, 5] == pytest.approx(5 * math.sqrt(2))

    def test_wall_routes_through_gap(self, wall_scene):
        s = wall_scene
        dist, parent = dijkstra_grid(s.height, s.connections, [(6, 12)])
        # node on the far side of the wall: path must detour via the gap rows,
        # so its distance exceeds the straight-line lower bound by a lot
        assert dist[6, 4] > 12
        # walk the parent chain from (6,4); it must pass through a gap cell
        y, x = 6, 4
        hops = []
        while parent[y, x] >= 0:
            y, x = divmod(int(parent[y, x]), s.height.shape[1])
            hops.append((y, x))
        assert (6, 12) == hops[-1]
        assert any(y <= 1 for y, x in hops), "path should cross the wall gap"

    def test_native_matches_numpy(self, wall_scene):
        if not loader.available():
            pytest.skip("native lib unavailable")
        from tod_tpu.planner.native import dijkstra_native

        s = wall_scene
        seeds = [(6, 12), (1, 2)]
        d1, p1 = dijkstra_grid(s.height, s.connections, seeds)
        d2, p2 = dijkstra_native(s.height, s.connections, seeds)
        np.testing.assert_allclose(d1, d2, rtol=1e-6)
        # parents may differ between equal-cost paths; distances must not
        assert np.isinf(d1).sum() == np.isinf(d2).sum()

    def test_tpu_relaxation_matches_dijkstra(self, wall_scene):
        s = wall_scene
        seed_mask = np.zeros(s.height.shape, bool)
        seed_mask[6, 12] = True
        dist_bf, next_dir = bellman_ford_grid(
            jnp.asarray(s.height), jnp.asarray(s.connections), jnp.asarray(seed_mask)
        )
        dist_dj, _ = dijkstra_grid(s.height, s.connections, [(6, 12)])
        np.testing.assert_allclose(np.asarray(dist_bf), dist_dj, rtol=1e-4)
        assert int(np.asarray(next_dir)[6, 12]) == -1


class TestDirections:
    def test_magnitudes_sum_to_total_cost(self, wall_scene):
        s = wall_scene
        dist, parent = dijkstra_grid(s.height, s.connections, [(6, 12)])
        start = (11, 0)
        dirs = extract_directions(dist, parent, s.pos, start)
        assert len(dirs) > 0
        total = sum(m for m, _ in dirs)
        assert total == pytest.approx(dist[start], rel=1e-6)
        assert dirs[0][1] == 0.0  # first rotation is 0 (src/path.rs:97)

    def test_rotation_straight_line_is_pi(self):
        # walking a straight line: consecutive segments are opposite vectors
        # (prev−cur vs next−cur) → angle π
        hm = np.zeros((4, 8), np.float32)
        s = _scene_from_height(hm, ball_yx=(1, 6))
        dist, parent = dijkstra_grid(s.height, s.connections, [(1, 6)])
        dirs = extract_directions(dist, parent, s.pos, (1, 0))
        for m, r in dirs[1:]:
            assert r == pytest.approx(math.pi, abs=1e-5)

    def test_signed_turns_straight_line_is_zero(self):
        """PlannerConfig.signed_turns intent semantics: straight ahead = 0
        (the reference-parity unsigned form reads π for the same path)."""
        hm = np.zeros((8, 5), np.float32)
        s = _scene_from_height(hm, ball_yx=(1, 2))
        dist, parent = dijkstra_grid(s.height, s.connections, [(1, 2)])
        dirs = extract_directions(dist, parent, s.pos, (7, 2), signed=True)
        assert len(dirs) == 6
        for _m, r in dirs:
            assert r == pytest.approx(0.0, abs=1e-6)  # walking straight up

    def test_signed_turns_encode_left_vs_right(self):
        """A ball up-and-right of the start yields a positive (toward +x)
        first turn; up-and-left a negative one — the drivable property the
        unsigned acos destroys (src/path.rs:105-110)."""
        hm = np.zeros((12, 12), np.float32)
        for bx, sign in ((9, 1.0), (1, -1.0)):
            s = _scene_from_height(hm, ball_yx=(2, bx))
            dist, parent = dijkstra_grid(s.height, s.connections, [(2, bx)])
            dirs = extract_directions(dist, parent, s.pos, (11, 5), signed=True)
            assert dirs and math.copysign(1.0, dirs[0][1]) == sign

    def test_signed_chain_traces_path_to_seed_on_flat_ground(self):
        """The drivable contract: executing "turn rotation[i], advance
        magnitude[i]" from the start's facing reconstructs the path — on
        FLAT ground, where hop cost equals Euclidean hop length, the chain's
        endpoint is the seed cell.  (On bumpy fields magnitudes carry the
        |Δh| cost term, so displacement is an overestimate and a follower
        must replan — which the sim controller does.)"""
        rng = np.random.default_rng(7)
        hm = np.zeros((32, 40), np.float32)
        for _ in range(6):
            by, bx = int(rng.integers(0, 20)), int(rng.integers(0, 40))
            sy, sx = int(rng.integers(25, 32)), int(rng.integers(0, 40))
            if (by, bx) == (sy, sx):
                continue
            s = _scene_from_height(hm, ball_yx=(by, bx))
            dist, parent = dijkstra_grid(s.height, s.connections, [(by, bx)])
            dirs = extract_directions(dist, parent, s.pos, (sy, sx), signed=True)
            assert dirs
            hx, hz = 0.0, -1.0
            x, z = float(sx), float(sy)
            for mag, rot in dirs:
                c, si = math.cos(rot), math.sin(rot)
                hx, hz = c * hx - si * hz, si * hx + c * hz
                x += mag * hx
                z += mag * hz
            assert (x, z) == pytest.approx((bx, by), abs=1e-3), (by, bx, sy, sx)

    def test_signed_turns_agree_across_backends(self):
        """numpy, host tpu-walk, and the fused device walk emit the SAME
        signed direction list (same plan_from_height inputs)."""
        import jax.numpy as jnp

        from tod_tpu.planner.api import plan_directions_device, plan_from_height

        hm = np.zeros((24, 32), np.float32)
        hm[10:14, 8:12] = 30.0  # a bump to detour around
        balls = np.zeros((8, 4), np.float32)
        balls[0] = [22.0, 4.0, 25.0, 1.0]
        cfg = PlannerConfig(backend="numpy", signed_turns=True)
        ref = np.asarray(plan_from_height(hm, balls, cfg).directions)
        tpu = np.asarray(
            plan_from_height(
                hm, balls, PlannerConfig(backend="tpu", signed_turns=True)
            ).directions
        )
        dev = np.asarray(
            plan_directions_device(
                jnp.asarray(hm), jnp.asarray(balls),
                PlannerConfig(backend="tpu", signed_turns=True),
            ).directions
        )
        assert ref.shape == tpu.shape == dev.shape
        np.testing.assert_allclose(ref, tpu, atol=1e-5)
        np.testing.assert_allclose(ref, dev, atol=1e-4)

    def test_unreachable_start_gives_empty(self):
        hm = np.zeros((6, 6), np.float32)
        pos, conns = connection_weights(jnp.asarray(hm))
        conns = np.asarray(conns).copy()
        conns[3, :, :] = -1.0  # sever row 3 edges both ways
        conns[2, :, 4:8] = -1.0
        conns[4, :, 0:4] = -1.0
        dist, parent = dijkstra_grid(hm, conns, [(0, 0)])
        assert not np.isfinite(dist[5, 5])
        assert extract_directions(dist, parent, np.asarray(pos), (5, 5)) == []


class TestPlanAPI:
    def test_plan_returns_path(self, wall_scene):
        p = plan(wall_scene, PlannerConfig(backend="numpy"))
        assert p.created > 0
        assert len(p.directions) > 0

    def test_no_balls_empty_path(self):
        hm = np.zeros((6, 6), np.float32)
        s = _scene_from_height(hm)
        s = Scene(
            height=s.height, pos=s.pos, balls=np.zeros((100, 4), np.float32),
            connections=s.connections,
        )
        p = plan(s, PlannerConfig(backend="numpy"))
        assert p.directions == []

    def test_backends_agree_on_total_cost(self, wall_scene):
        totals = {}
        for backend in ("numpy", "native", "tpu"):
            if backend == "native" and not loader.available():
                continue
            p = plan(wall_scene, PlannerConfig(backend=backend))
            totals[backend] = sum(m for m, _ in p.directions)
        vals = list(totals.values())
        for v in vals[1:]:
            assert v == pytest.approx(vals[0], rel=1e-4)

    def test_seeds_from_balls_ordering_and_validity(self):
        balls = np.zeros((100, 4), np.float32)
        balls[0] = [5, 5, 3, 0]
        balls[1] = [1, 2, 10, 0]  # strongest
        balls[2] = [50, 50, 7, 0]  # out of grid → skipped
        seeds = seeds_from_balls(balls, 3, (10, 10))
        assert seeds == [(2, 1), (5, 5)]

    def test_start_node_matches_reference_literal(self):
        # START_NODE = 640*480 − 240 → (479, 400) (src/path.rs:93)
        assert start_node_yx((480, 640)) == (479, 400)


class TestPlanFromHeight:
    def test_matches_full_scene_plan(self, wall_scene):
        from tod_tpu.planner.api import plan_from_height

        full = plan(wall_scene, PlannerConfig(backend="numpy"))
        light = plan_from_height(
            np.asarray(wall_scene.height), np.asarray(wall_scene.balls),
            PlannerConfig(backend="numpy"),
        )
        assert len(full.directions) == len(light.directions)
        np.testing.assert_allclose(
            np.asarray(full.directions), np.asarray(light.directions), rtol=1e-5
        )

    def test_native_height_backend_matches_numpy(self, wall_scene):
        if not loader.available():
            pytest.skip("native lib unavailable")
        from tod_tpu.planner.api import plan_from_height

        h = np.asarray(wall_scene.height)
        b = np.asarray(wall_scene.balls)
        a = plan_from_height(h, b, PlannerConfig(backend="native"))
        c = plan_from_height(h, b, PlannerConfig(backend="numpy"))
        assert sum(m for m, _ in a.directions) == pytest.approx(
            sum(m for m, _ in c.directions), rel=1e-5
        )

    def test_native_bidir_matches_forward(self):
        """Bidirectional Dial search (planner.cpp tod_dijkstra_height_bidir):
        same optimal start cost as the forward pass on random / smooth / wall
        fields, and its path-only (dist, parent) fill walks monotonically to
        a seed.  Ties may route differently; COST is the contract."""
        if not loader.available():
            pytest.skip("native lib unavailable")
        lib = loader.get()
        rng = np.random.default_rng(0)
        h, w = 96, 128
        for trial in range(12):
            kind = trial % 3
            if kind == 0:
                height = rng.normal(0, 1, (h, w)).astype(np.float32)
            elif kind == 1:
                yy, xx = np.mgrid[0:h, 0:w]
                height = (np.sin(yy / 9.0) * 3 + np.cos(xx / 11.0) * 2).astype(
                    np.float32
                )
            else:
                height = np.zeros((h, w), np.float32)
                height[20:70, 50:55] = 50.0
            n_seeds = int(rng.integers(1, 4))
            seeds = np.stack(
                [rng.integers(0, h, n_seeds), rng.integers(0, w, n_seeds)], 1
            ).astype(np.int32)
            sy, sx = h - 1, w // 2
            d1 = np.empty((h, w), np.float64)
            p1 = np.empty((h, w), np.int64)
            d2 = np.empty((h, w), np.float64)
            p2 = np.empty((h, w), np.int64)
            lib.tod_dijkstra_height(
                height.reshape(-1), h, w, seeds.reshape(-1), n_seeds, sy, sx,
                d1.reshape(-1), p1.reshape(-1),
            )
            lib.tod_dijkstra_height_bidir(
                height.reshape(-1), h, w, seeds.reshape(-1), n_seeds, sy, sx,
                d2.reshape(-1), p2.reshape(-1),
            )
            assert np.isfinite(d2[sy, sx]) == np.isfinite(d1[sy, sx])
            if not np.isfinite(d1[sy, sx]):
                continue
            # f32 labels on both sides: same band as the backend-agreement test
            assert d2[sy, sx] == pytest.approx(d1[sy, sx], rel=1e-4)
            y, x, steps = sy, sx, 0
            while p2[y, x] >= 0 and steps <= h * w:
                py, px = divmod(int(p2[y, x]), w)
                assert d2[py, px] < d2[y, x] + 1e-6
                y, x = py, px
                steps += 1
            assert any((y, x) == (int(s[0]), int(s[1])) for s in seeds)

    def test_start_node_clamped_onto_grid(self):
        """offset <= 0 must clamp to the last column — column w would index
        one past the row (and overflow the native bidir planner's heap
        buffers at the C ABI)."""
        assert start_node_yx((10, 8), offset=0) == (9, 7)
        assert start_node_yx((10, 8), offset=-5) == (9, 7)
        assert start_node_yx((10, 8), offset=3) == (9, 5)
        assert start_node_yx((10, 8), offset=100) == (9, 0)

    def test_native_bidir_out_of_grid_start_is_safe(self):
        """A start outside the grid (caller bug) must fall back to the plain
        forward pass instead of writing past the bidir heap buffers."""
        if not loader.available():
            pytest.skip("native lib unavailable")
        lib = loader.get()
        h, w = 24, 32
        height = np.zeros((h, w), np.float32)
        seeds = np.array([[2, 3]], np.int32)
        for sy, sx in ((h - 1, w), (h, 0), (h + 5, w + 5)):
            d = np.empty((h, w), np.float64)
            p = np.empty((h, w), np.int64)
            lib.tod_dijkstra_height_bidir(
                height.reshape(-1), h, w, seeds.reshape(-1), 1, sy, sx,
                d.reshape(-1), p.reshape(-1),
            )
            # full forward relaxation: every cell reachable from the seed
            assert np.isfinite(d).all()
            assert d[2, 3] == 0.0

    def test_plan_from_height_bidir_flag(self, wall_scene):
        if not loader.available():
            pytest.skip("native lib unavailable")
        from tod_tpu.planner.api import plan_from_height

        h = np.asarray(wall_scene.height)
        b = np.asarray(wall_scene.balls)
        on = plan_from_height(h, b, PlannerConfig(backend="native", bidirectional=True))
        off = plan_from_height(
            h, b, PlannerConfig(backend="native", bidirectional=False)
        )
        assert sum(m for m, _ in on.directions) == pytest.approx(
            sum(m for m, _ in off.directions), rel=1e-4
        )

    def test_tpu_backend_and_unknown_backend(self, wall_scene):
        from tod_tpu.planner.api import plan_from_height

        h = np.asarray(wall_scene.height)
        b = np.asarray(wall_scene.balls)
        t = plan_from_height(h, b, PlannerConfig(backend="tpu"))
        n = plan_from_height(h, b, PlannerConfig(backend="numpy"))
        assert sum(m for m, _ in t.directions) == pytest.approx(
            sum(m for m, _ in n.directions), rel=1e-4
        )
        with pytest.raises(ValueError):
            plan_from_height(h, b, PlannerConfig(backend="nativ"))


class TestDeviceplan:
    def test_plan_on_device_matches_host_path(self):
        """The fully device-resident planning graph (seeds → relaxation →
        path walk, planner.tpu_relax.plan_on_device) must produce the same
        direction list as the host pipeline on the same height map."""
        import jax.numpy as jnp

        from tod_tpu.planner.api import plan_directions_device, plan_from_height
        from tod_tpu.core.config import PlannerConfig

        rng = np.random.default_rng(3)
        hm = np.cumsum(rng.normal(0, 0.3, (48, 64)), axis=0).astype(np.float32)
        hm -= hm.min()
        balls = np.zeros((16, 4), np.float32)
        balls[0] = [50.0, 8.0, 40.0, 0.0]   # (x̄, ȳ, count, 0)
        balls[1] = [10.0, 30.0, 25.0, 0.0]
        cfg = PlannerConfig(backend="numpy")
        host = plan_from_height(hm, balls, cfg)
        dev = plan_directions_device(jnp.asarray(hm), jnp.asarray(balls), cfg)
        assert len(dev.directions) == len(host.directions) > 5
        hm_total = sum(m for m, _ in host.directions)
        dv_total = sum(m for m, _ in dev.directions)
        assert dv_total == pytest.approx(hm_total, rel=1e-4)
        for (m1, r1), (m2, r2) in zip(host.directions, dev.directions):
            assert m2 == pytest.approx(m1, rel=1e-3, abs=1e-3)
            assert r2 == pytest.approx(r1, abs=1e-4)

    def test_plan_on_device_no_balls_is_empty(self):
        import jax.numpy as jnp

        from tod_tpu.planner.api import plan_directions_device

        hm = jnp.zeros((32, 32), jnp.float32)
        balls = jnp.zeros((8, 4), jnp.float32)
        p = plan_directions_device(hm, balls)
        assert p.directions == []
