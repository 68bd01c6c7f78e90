"""Tests for the packed voxel map: build, lookup, correspondence queries."""

import jax
import jax.numpy as jnp
import numpy as np

from elimaloc_tpu.map import (
    build_voxel_map,
    find_ground_height,
    find_ground_height_host,
    lookup,
    query_all_voxel_cov,
    query_nearest_point,
    query_nearest_voxel_cov,
    to_device,
    voxel_downsample,
    voxel_downsample_host,
)

import ref_numpy as ref

RNG = np.random.default_rng(11)


def make_map(n=2000, extent=20.0, voxel=1.0, max_pts=10, **kw):
    pts = RNG.uniform(-extent, extent, size=(n, 3))
    built = build_voxel_map(pts, voxel, max_pts, use_native=False, **kw)
    return pts, built


class TestBuilder:
    def test_counts_and_spacing(self):
        pts, built = make_map(n=500, extent=3.0, voxel=1.0, max_pts=5)
        res = np.sqrt(1.0 / 5)
        assert (built.counts <= 5).all()
        for vi in range(built.num_voxels):
            c = built.counts[vi]
            blk = built.points[vi, :c]
            if c > 1:
                d = np.linalg.norm(blk[:, None, :] - blk[None, :, :], axis=-1)
                d += np.eye(c) * 1e9
                assert d.min() >= res - 1e-12

    def test_floor_bucketing_negative_coords(self):
        pts = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
        built = build_voxel_map(pts, 1.0, 5, use_native=False)
        coords = {tuple(c) for c in built.vox_coords}
        assert coords == {(-1, -1, -1), (0, 0, 0)}

    def test_voxel_cov_matches_oracle(self):
        # Planar data keeps the eigenbasis well-conditioned so the SVD
        # regularization is numerically stable across float precisions (for
        # isotropic voxels the regularized cov is eigenvector-degenerate by
        # construction — any basis is equally valid).
        xy = RNG.uniform(0, 4, size=(300, 2))
        pts = np.c_[xy, 0.05 * xy[:, :1] + 0.02 * xy[:, 1:]]
        built = build_voxel_map(
            pts, 2.0, 20, compute_voxel_cov=True, use_native=False
        )
        for vi in range(built.num_voxels):
            c = built.counts[vi]
            if c < 4:
                continue
            cov_o, mean_o = ref.voxel_cov_np(built.points[vi, :c].astype(np.float64))
            np.testing.assert_allclose(built.vox_mean[vi], mean_o, atol=1e-4)
            np.testing.assert_allclose(built.vox_cov[vi], cov_o, atol=1e-3)
            evs = np.linalg.eigvalsh(built.vox_cov[vi].astype(np.float64))
            np.testing.assert_allclose(sorted(evs), [1e-3, 1.0, 1.0], atol=1e-4)

    def test_point_cov_plane_regularized(self):
        # Points on a plane: smallest eigenvalue of each point cov ~ 1e-3.
        xy = RNG.uniform(-3, 3, size=(400, 2))
        pts = np.c_[xy, np.zeros(400)]
        built = build_voxel_map(
            pts, 1.0, 10, compute_point_cov=True, gicp_cov_search_dist=0.5,
            use_native=False,
        )
        evs = np.linalg.eigvalsh(built.point_cov[built.counts > 0][0, 0])
        np.testing.assert_allclose(sorted(evs), [1e-3, 1.0, 1.0], atol=1e-5)


class TestLookup:
    def test_lookup_hits_and_misses(self):
        pts, built = make_map()
        grid = to_device(built)
        coords = jnp.asarray(built.vox_coords)
        rows = np.asarray(lookup(grid, coords))
        np.testing.assert_array_equal(rows, np.arange(built.num_voxels))
        # A coordinate that does not exist maps to the sentinel.
        miss = jnp.asarray([[999, 999, 999]], dtype=jnp.int32)
        assert int(lookup(grid, miss)[0]) == grid.sentinel

    def test_lookup_jit(self):
        _, built = make_map(n=100)
        grid = to_device(built)
        f = jax.jit(lambda g, c: lookup(g, c))
        rows = np.asarray(f(grid, jnp.asarray(built.vox_coords)))
        np.testing.assert_array_equal(rows, np.arange(built.num_voxels))


class TestQueries:
    def test_nearest_point_matches_bruteforce_oracle(self):
        pts, built = make_map(n=1500, extent=10.0, voxel=1.0, max_pts=30)
        map_pts = built.all_points()
        queries = RNG.uniform(-9, 9, size=(64, 3))
        target, valid, _, _ = query_nearest_point(
            to_device(built), jnp.asarray(queries, jnp.float32), 5.0
        )
        target, valid = np.asarray(target), np.asarray(valid)
        for i, q in enumerate(queries):
            best, best_d2 = ref.nearest_in_27_voxels_np(q, map_pts, 1.0)
            if best is None or best_d2 >= 25.0:
                assert not valid[i]
            else:
                assert valid[i]
                np.testing.assert_allclose(target[i], best, atol=1e-5)

    def test_nearest_point_max_dist_gate(self):
        pts = np.array([[0.1, 0.1, 0.1]])
        built = build_voxel_map(pts, 1.0, 5, use_native=False)
        grid = to_device(built)
        q = jnp.asarray([[0.35, 0.1, 0.1]], jnp.float32)
        _, valid, _, _ = query_nearest_point(grid, q, 0.5)
        assert bool(valid[0])
        _, valid, _, _ = query_nearest_point(grid, q, 0.2)
        assert not bool(valid[0])

    def test_nearest_voxel_cov(self):
        pts, built = make_map(
            n=3000, extent=8.0, voxel=1.0, max_pts=30, compute_voxel_cov=True
        )
        grid = to_device(built)
        queries = RNG.uniform(-7, 7, size=(32, 3)).astype(np.float32)
        cov, mean, valid = query_nearest_voxel_cov(grid, jnp.asarray(queries), 5.0)
        cov, mean, valid = np.asarray(cov), np.asarray(mean), np.asarray(valid)
        # Oracle: nearest voxel mean among 27 neighbors.
        for i, q in enumerate(queries):
            qv = np.floor(q / 1.0).astype(int)
            best_d2, best_mean = np.inf, None
            for vi in range(built.num_voxels):
                if np.all(np.abs(built.vox_coords[vi] - qv) <= 1):
                    d2 = np.sum((built.vox_mean[vi] - q) ** 2)
                    if d2 < best_d2:
                        best_d2, best_mean = d2, built.vox_mean[vi]
            if best_mean is None or best_d2 >= 25.0:
                assert not valid[i]
            else:
                assert valid[i]
                np.testing.assert_allclose(mean[i], best_mean, atol=1e-5)

    def test_all_voxel_cov_seven_neighbors(self):
        pts, built = make_map(
            n=3000, extent=8.0, voxel=1.0, max_pts=30, compute_voxel_cov=True
        )
        grid = to_device(built)
        queries = RNG.uniform(-7, 7, size=(16, 3)).astype(np.float32)
        cov, mean, valid = query_all_voxel_cov(grid, jnp.asarray(queries), 5.0)
        valid = np.asarray(valid)
        offs = np.array(
            [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
             [0, 0, -1]]
        )
        coord_set = {tuple(c): i for i, c in enumerate(built.vox_coords)}
        for i, q in enumerate(queries):
            qv = np.floor(q / 1.0).astype(int)
            for j, o in enumerate(offs):
                row = coord_set.get(tuple(qv + o))
                want = row is not None and np.sum(
                    (built.vox_mean[row] - q) ** 2
                ) < 25.0
                assert valid[i, j] == want

    def test_gicp_query_returns_neighborhood_mean(self):
        pts, built = make_map(
            n=800, extent=5.0, voxel=1.0, max_pts=10,
            compute_point_cov=True, gicp_cov_search_dist=0.4,
        )
        grid = to_device(built)
        q = jnp.asarray(pts[:8], jnp.float32)
        target, cov, mean, valid = __import__("elimaloc_tpu.map", fromlist=["x"]).query_nearest_point_cov(
            grid, q, 5.0
        )
        assert bool(np.asarray(valid).all())
        # cov rows are plane-regularized (eigvals <= ~1)
        evs = np.linalg.eigvalsh(np.asarray(cov))
        assert evs.max() < 1.5


class TestDownsample:
    def test_matches_host_reference(self):
        pts = RNG.uniform(-5, 5, size=(400, 3)).astype(np.float32)
        want = voxel_downsample_host(pts, 1.5)
        out, valid, kept = voxel_downsample(
            jnp.asarray(pts), jnp.ones(400, bool), 1.5, 512
        )
        got = np.asarray(out)[np.asarray(valid)]
        assert int(kept) == want.shape[0]
        np.testing.assert_allclose(
            np.sort(got, axis=0), np.sort(want, axis=0), atol=1e-6
        )

    def test_respects_input_validity_and_budget(self):
        pts = RNG.uniform(-5, 5, size=(100, 3)).astype(np.float32)
        valid_in = jnp.arange(100) < 50
        out, valid, kept = voxel_downsample(jnp.asarray(pts), valid_in, 0.01, 32)
        assert int(kept) == 32  # 50 unique voxels clipped to budget
        assert int(valid.sum()) == 32

    def test_first_point_wins(self):
        pts = np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8], [1.5, 0.0, 0.0]],
                       dtype=np.float32)
        out, valid, kept = voxel_downsample(jnp.asarray(pts), jnp.ones(3, bool), 1.0, 4)
        got = np.asarray(out)[np.asarray(valid)]
        assert int(kept) == 2
        assert any(np.allclose(g, [0.2, 0.2, 0.2]) for g in got)
        assert any(np.allclose(g, [1.5, 0.0, 0.0]) for g in got)


class TestGroundHeight:
    def test_device_matches_host(self):
        pts = np.r_[
            RNG.uniform(-3, 3, size=(200, 3)) + [0, 0, 5.0],
            RNG.uniform(-3, 3, size=(50, 2)).tolist() and
            np.c_[RNG.uniform(-3, 3, size=(50, 2)), RNG.normal(0, 0.01, 50)],
        ]
        built = build_voxel_map(pts, 1.0, 30, use_native=False)
        ok_h, z_h = find_ground_height_host(built, [0.0, 0.0])
        ok_d, z_d = find_ground_height(to_device(built), jnp.asarray([0.0, 0.0]))
        assert ok_h and bool(ok_d)
        assert abs(float(z_d) - z_h) < 0.05
