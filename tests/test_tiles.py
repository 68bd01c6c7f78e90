"""Tile-blocked queries must agree with the hash-grid reference queries."""

import jax.numpy as jnp
import numpy as np
import pytest

from elimaloc_tpu.map import (
    TileQueryBudget,
    build_tile_map,
    build_voxel_map,
    to_device,
)
from elimaloc_tpu.map import grid as hashgrid
from elimaloc_tpu.map import tiles

RNG = np.random.default_rng(33)
BUDGET = TileQueryBudget(qb=32, max_slots=1024)
BUDGET_P = TileQueryBudget(qb=8, max_slots=1024, pallas=True)


def make_maps(n=4000, extent=15.0, voxel=1.0, max_pts=10, **kw):
    pts = RNG.uniform(-extent, extent, size=(n, 3))
    built = build_voxel_map(pts, voxel, max_pts, use_native=False, **kw)
    return to_device(built), build_tile_map(built, tile_voxels=4).to_device()


def queries(n=512, extent=16.0):
    # include out-of-map and negative-coordinate queries
    return jnp.asarray(RNG.uniform(-extent, extent, size=(n, 3)), jnp.float32)


class TestNearestPoint:
    @pytest.mark.parametrize("budget", [BUDGET, BUDGET_P],
                             ids=["xla", "pallas"])
    def test_matches_hash_grid(self, budget):
        grid, tmap = make_maps()
        q = queries()
        v_in = jnp.ones(q.shape[0], bool)
        t_h, v_h, _, _ = hashgrid.query_nearest_point(grid, q, 5.0)
        t_t, v_t = tiles.query_nearest_point(tmap, q, v_in, 5.0, budget)
        np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_h))
        # same nearest distance (tie order may differ)
        d_h = np.linalg.norm(np.asarray(t_h) - np.asarray(q), axis=1)
        d_t = np.linalg.norm(np.asarray(t_t) - np.asarray(q), axis=1)
        np.testing.assert_allclose(
            d_t[np.asarray(v_t)], d_h[np.asarray(v_h)], atol=1e-5
        )

    def test_respects_input_validity(self):
        grid, tmap = make_maps()
        q = queries()
        v_in = jnp.arange(q.shape[0]) % 2 == 0
        t_t, v_t = tiles.query_nearest_point(tmap, q, v_in, 5.0, BUDGET)
        assert not np.asarray(v_t)[1::2].any()

    @pytest.mark.parametrize("budget", [BUDGET, BUDGET_P],
                             ids=["xla", "pallas"])
    def test_gicp_payloads_match(self, budget):
        grid, tmap = make_maps(compute_point_cov=True, gicp_cov_search_dist=0.5)
        q = queries(256)
        v_in = jnp.ones(q.shape[0], bool)
        t_h, c_h, m_h, v_h = hashgrid.query_nearest_point_cov(grid, q, 5.0)
        t_t, v_t, c_t, m_t = tiles.query_nearest_point(
            tmap, q, v_in, 5.0, budget, with_point_cov=True
        )
        np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_h))
        sel = np.asarray(v_t)
        # payloads agree wherever the same point was selected (non-tie)
        same = np.all(np.isclose(np.asarray(t_t), np.asarray(t_h)), axis=1) & sel
        np.testing.assert_allclose(
            np.asarray(c_t)[same], np.asarray(c_h)[same], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m_t)[same], np.asarray(m_h)[same], atol=1e-5
        )


class TestVoxelCov:
    @pytest.mark.parametrize("budget", [BUDGET, BUDGET_P],
                             ids=["xla", "pallas"])
    def test_matches_hash_grid(self, budget):
        grid, tmap = make_maps(compute_voxel_cov=True)
        q = queries()
        v_in = jnp.ones(q.shape[0], bool)
        c_h, m_h, v_h = hashgrid.query_nearest_voxel_cov(grid, q, 5.0)
        c_t, m_t, v_t = tiles.query_nearest_voxel_cov(tmap, q, v_in, 5.0, budget)
        np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_h))
        sel = np.asarray(v_t)
        np.testing.assert_allclose(
            np.asarray(m_t)[sel], np.asarray(m_h)[sel], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_t)[sel], np.asarray(c_h)[sel], atol=1e-5
        )


class TestAllVoxelCov:
    @pytest.mark.parametrize("budget", [BUDGET, BUDGET_P],
                             ids=["xla", "pallas"])
    def test_matches_hash_grid(self, budget):
        grid, tmap = make_maps(compute_voxel_cov=True)
        q = queries()
        v_in = jnp.ones(q.shape[0], bool)
        c_h, m_h, v_h = hashgrid.query_all_voxel_cov(grid, q, 5.0)
        c_t, m_t, v_t = tiles.query_all_voxel_cov(tmap, q, v_in, 5.0, budget)
        np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_h))
        sel = np.asarray(v_t)
        np.testing.assert_allclose(
            np.asarray(m_t)[sel], np.asarray(m_h)[sel], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_t)[sel], np.asarray(c_h)[sel], atol=1e-5
        )


def test_slot_overflow_drops_gracefully():
    grid, tmap = make_maps()
    q = queries(512)
    tiny = TileQueryBudget(qb=8, max_slots=8)  # way too small
    t_t, v_t = tiles.query_nearest_point(tmap, q, jnp.ones(512, bool), 5.0, tiny)
    # Dropped queries come back invalid, never wrong.
    t_h, v_h, _, _ = hashgrid.query_nearest_point(grid, q, 5.0)
    kept = np.asarray(v_t)
    assert kept.sum() < np.asarray(v_h).sum()
    d_h = np.linalg.norm(np.asarray(t_h) - np.asarray(q), axis=1)
    d_t = np.linalg.norm(np.asarray(t_t) - np.asarray(q), axis=1)
    np.testing.assert_allclose(d_t[kept], d_h[kept], atol=1e-5)


def test_assignment_covers_all_queries_with_budget():
    _, tmap = make_maps()
    q = queries(512)
    asg = tiles.assign_slots(tmap, q, jnp.ones(512, bool), BUDGET)
    assert int(asg.dropped) == 0
    assert int(asg.qmask.sum()) == 512
