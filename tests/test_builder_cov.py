"""Vectorized vs loop covariance precompute equivalence.

The SVD plane regularization U diag(1,1,1e-3) V^T is basis-arbitrary when the
raw neighbor covariance has degenerate eigenvalues (collinear/duplicate
neighbor sets) — inherent to the reference's algorithm (voxel_hash_map.hpp:
141-144), so equivalence is asserted on eigenvalues everywhere and on full
matrices only where the spectrum is well-separated.
"""

import numpy as np

from elimaloc_tpu.map.builder import (
    _point_cov_all,
    _point_cov_all_loop,
    build_voxel_map,
)

RNG = np.random.default_rng(7)


def test_vectorized_point_cov_matches_loop():
    pts = RNG.uniform(-15, 15, (6000, 3))
    built = build_voxel_map(pts, 1.0, 10, use_native=False)
    pc_v, pm_v = _point_cov_all(built, 0.4)
    pc_l, pm_l = _point_cov_all_loop(built, 0.4)

    np.testing.assert_allclose(pm_v, pm_l, atol=1e-5)

    # On rank-deficient neighbor sets (2 neighbors -> rank-1 raw covariance)
    # LAPACK's U and V differ arbitrarily in the null space, so
    # U diag(1,1,1e-3) V^T is an arbitrary ASYMMETRIC matrix — in the
    # reference's Eigen::JacobiSVD exactly as here. Only well-conditioned
    # rows (near-symmetric outputs) are comparable.
    mask = np.arange(built.max_points_per_voxel)[None, :] < built.counts[:, None]
    pv = pc_v[mask].astype(np.float64)
    pl = pc_l[mask].astype(np.float64)
    sym = np.abs(pl - np.swapaxes(pl, 1, 2)).max(axis=(1, 2)) < 1e-4
    assert sym.mean() > 0.85, f"too many degenerate rows: {1 - sym.mean():.2%}"
    np.testing.assert_allclose(pv[sym], pl[sym], atol=1e-4)
