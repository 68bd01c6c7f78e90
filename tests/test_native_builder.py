"""Native C++ builder vs NumPy fallback: identical insertion semantics."""

import numpy as np
import pytest

from elimaloc_tpu.map import native_builder
from elimaloc_tpu.map.builder import _insert_points_numpy


def _canon(vc, blk, cnt):
    order = np.lexsort((vc[:, 2], vc[:, 1], vc[:, 0]))
    return vc[order], blk[order], cnt[order]


@pytest.mark.skipif(
    native_builder.maybe_load() is None,
    reason="native lib not built (make -C native)",
)
def test_native_matches_numpy():
    nb = native_builder.maybe_load()
    rng = np.random.default_rng(5)
    pts = rng.uniform(-20, 20, size=(20000, 3))
    vc_n, blk_n, cnt_n = _canon(*nb.insert_points(pts, 1.0, 10))
    vc_p, blk_p, cnt_p = _canon(*_insert_points_numpy(pts, 1.0, 10))
    np.testing.assert_array_equal(vc_n, vc_p)
    np.testing.assert_array_equal(cnt_n, cnt_p)
    mask = np.arange(10)[None, :] < cnt_n[:, None]
    np.testing.assert_allclose(blk_n[mask], blk_p[mask])


@pytest.mark.skipif(
    native_builder.maybe_load() is None,
    reason="native lib not built (make -C native)",
)
def test_native_full_build_matches_numpy():
    """build_voxel_map native vs NumPy: the native finish pass fuses the
    f32 rounding, inf padding, and mean/cov accumulation — the resulting
    BuiltMap must match the pure-NumPy build on every tensor."""
    from elimaloc_tpu.map.builder import build_voxel_map

    rng = np.random.default_rng(7)
    pts = rng.uniform(-15, 15, size=(30000, 3))
    bn = build_voxel_map(pts, 1.0, 10, compute_voxel_cov=True,
                         use_native=True)
    bp = build_voxel_map(pts, 1.0, 10, compute_voxel_cov=True,
                         use_native=False)
    on = np.lexsort(bn.vox_coords.T)
    op = np.lexsort(bp.vox_coords.T)
    np.testing.assert_array_equal(bn.vox_coords[on], bp.vox_coords[op])
    np.testing.assert_array_equal(bn.counts[on], bp.counts[op])
    # stored points: identical incl. the +inf pad rows (both f32-rounded)
    np.testing.assert_array_equal(bn.points[on], bp.points[op])
    np.testing.assert_allclose(
        bn.vox_mean[on], bp.vox_mean[op], rtol=0, atol=1e-6)
    # The regularized cov goes through an eigendecomposition whose plane
    # normal is ill-conditioned for near-isotropic voxels (an eps-level raw
    # difference rotates q3 by eps/gap) — so pin the native contract at the
    # RAW covariance instead, which must match the NumPy accumulation to
    # machine precision. Regularization itself is shared code
    # (_plane_regularize_batch, covered by test_builder_cov).
    nb = native_builder.maybe_load()
    _, _, cnt_r, _, raw_n = nb.build_map(pts, 1.0, 10)
    from elimaloc_tpu.map.builder import _insert_points_numpy

    vc_p, blk_p, cnt_p = _insert_points_numpy(pts, 1.0, 10)
    blk_p = blk_p.astype(np.float32).astype(np.float64)
    mask = np.arange(10)[None, :] < cnt_p[:, None]
    masked = np.where(mask[:, :, None], blk_p, 0.0)
    mean_p = masked.sum(axis=1) / np.maximum(cnt_p, 1)[:, None]
    centered = np.where(mask[:, :, None], blk_p - mean_p[:, None, :], 0.0)
    raw_p = np.einsum("vmi,vmj->vij", centered, centered) / np.maximum(
        cnt_p - 1, 1)[:, None, None]
    np.testing.assert_allclose(raw_n[on], raw_p[op], rtol=0, atol=1e-12)


@pytest.mark.skipif(
    native_builder.maybe_load() is None,
    reason="native lib not built (make -C native)",
)
def test_native_negative_coords_floor():
    nb = native_builder.maybe_load()
    pts = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
    vc, _, cnt = nb.insert_points(pts, 1.0, 5)
    assert {tuple(c) for c in vc} == {(-1, -1, -1), (0, 0, 0)}
    assert (cnt == 1).all()


@pytest.mark.skipif(
    native_builder.maybe_load() is None
    or not getattr(native_builder.maybe_load(), "_has_scan_step", False),
    reason="native lib without scan step (make -C native)",
)
def test_native_scan_step_matches_numpy():
    """The native single-core scan step (the honest CPU baseline,
    native/src/scan_step.cpp) matches reference_cpu.cpu_scan_step.

    The scan samples map points exactly (no observation noise) so the ICP
    optimum is sharp and unambiguous: both implementations must converge to
    the same pose. (On a noisy world the 0.02 termination threshold races
    with f64 tie-order noise and the two can legitimately stop at different
    iterations — that chaos is the algorithm's, not an implementation gap.)
    """
    from elimaloc_tpu.map.builder import build_voxel_map
    from elimaloc_tpu.reference_cpu import CpuVoxelGrid, cpu_scan_step

    nb = native_builder.maybe_load()
    rng = np.random.default_rng(11)
    # random (lattice-free) world; dense map (max_pts 60 -> min spacing
    # 0.13 m) and a noise-free exact-subset scan: every scan point has an
    # exact map twin, so the optimum is sharp and tie-free and both
    # implementations must converge to the same pose
    ground = np.c_[rng.uniform(-30, 30, (40_000, 2)),
                   rng.normal(0, 0.05, 40_000)]
    wall_y = np.c_[rng.uniform(-30, 30, 8000),
                   np.full(8000, 10.0) + rng.normal(0, 0.05, 8000),
                   rng.uniform(0, 4, 8000)]
    wall_x = np.c_[np.full(8000, -8.0) + rng.normal(0, 0.05, 8000),
                   rng.uniform(-30, 30, 8000),
                   rng.uniform(0, 4, 8000)]
    world = np.r_[ground, wall_y, wall_x]
    built = build_voxel_map(world, 1.0, 60, use_native=False)
    grid = CpuVoxelGrid(built)

    scan = world[rng.choice(len(world), 4000, replace=False)]
    true_pose = np.eye(4)
    true_pose[:3, 3] = [1.0, 2.0, 0.0]
    scan_local = scan - true_pose[:3, 3]
    init = true_pose.copy()
    init[:3, 3] += [0.2, -0.15, 0.05]
    # no-op deskew (zero rates/increment): the scan is undistorted, so a
    # real deskew would smear it; deskew equivalence is covered bit-tight by
    # test_native_preprocess_matches_numpy below
    rel = np.sort(rng.uniform(0.0, 0.1, 4000))
    imu_t = np.arange(0.0, 0.2, 0.01)
    imu_gyro = np.zeros((len(imu_t), 3))
    incre = np.zeros(3)
    # term=0 disables the early-termination race: both run exactly
    # max_iter iterations, so the comparison is step-for-step
    pose_np, ok_np, fit_np = cpu_scan_step(
        grid, scan_local, rel, imu_t, imu_gyro, 0.05, 0.15, incre, init,
        ds_voxel=1.0, max_dist=60.0, term=0.0)
    res = nb.scan_step_p2p(
        built, scan_local, rel, imu_t, imu_gyro, 0.05, 0.15, incre, init,
        max_range=60.0, ds_voxel=1.0, term=0.0)
    assert res is not None
    pose_c, ok_c, fit_c = res
    assert ok_c == ok_np
    np.testing.assert_allclose(pose_c, pose_np, rtol=0, atol=1e-4)
    assert fit_c == pytest.approx(fit_np, abs=1e-4)


@pytest.mark.skipif(
    native_builder.maybe_load() is None
    or not getattr(native_builder.maybe_load(), "_has_scan_step", False),
    reason="native lib without scan step (make -C native)",
)
def test_native_preprocess_matches_numpy():
    """Range gate + deskew + downsample: native vs NumPy, bit-tight."""
    import ctypes

    from elimaloc_tpu.reference_cpu import deskew_np, voxel_downsample_np

    nb = native_builder.maybe_load()
    rng = np.random.default_rng(12)
    scan = rng.uniform(-30, 30, (4000, 3))
    rel = np.sort(rng.uniform(0.0, 0.1, 4000))
    imu_t = np.arange(0.0, 0.2, 0.01)
    imu_gyro = np.ascontiguousarray(
        rng.normal(0, 0.1, (len(imu_t), 3)))
    incre = np.array([0.4, -0.1, 0.02])

    d_np = deskew_np(scan.copy(), rel, imu_t, imu_gyro, 0.05, 0.15, incre)
    ds_np = voxel_downsample_np(d_np, 1.0)

    c = nb._c
    c.elm_preprocess_scan.restype = ctypes.c_int64
    out = np.zeros((5000, 3))
    scanc = np.ascontiguousarray(scan)
    nd = c.elm_preprocess_scan(
        scanc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(4000),
        imu_t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        imu_gyro.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(imu_t)),
        ctypes.c_double(0.05), ctypes.c_double(0.15),
        incre.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(60.0), ctypes.c_double(1.0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(5000))
    assert nd == len(ds_np)
    np.testing.assert_allclose(out[:nd], ds_np, rtol=0, atol=1e-12)
