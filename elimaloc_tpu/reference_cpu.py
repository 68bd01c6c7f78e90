"""Reference-faithful single-core CPU pipeline (NumPy, no JAX).

The reference publishes no benchmark numbers (BASELINE.md), so the baseline
for the TPU speedup claim is measured from this implementation: the same
per-scan math — deskew, voxel downsample, 27-voxel nearest-neighbor
correspondence over the packed hash grid, robust Gauss-Newton/LM P2P ICP, and
the EKF update — written as well-vectorized single-threaded NumPy. This is a
*strong* CPU baseline (vectorized array code over the same packed map arrays,
comparable to the reference's C++/TBB path normalized to one core), not a
Python-loop strawman.

It also serves as an end-to-end oracle: bench.py checks the TPU pipeline's
poses against this implementation's on the same log.
"""

from __future__ import annotations

import numpy as np

from .map.builder import BuiltMap, hash_coords, fingerprint_coords


class CpuVoxelGrid:
    """NumPy view of the packed voxel map with the same windowed-probe hash."""

    def __init__(self, built: BuiltMap):
        self.voxel_size = built.voxel_size
        p = built.max_probe
        self.max_probe = p
        self.table_size = built.table_size
        self.table = np.concatenate([built.table, built.table[:p]])
        self.table_fp = np.concatenate([built.table_fp, built.table_fp[:p]])
        m = built.max_points_per_voxel
        self.points = np.concatenate(
            [built.points, np.full((1, m, 3), np.inf, np.float32)], axis=0
        )
        self.sentinel = built.num_voxels
        self._offsets = np.array(
            [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
            dtype=np.int64,
        )

    def lookup(self, coords):
        h = hash_coords(coords, self.table_size)
        fp = fingerprint_coords(coords)
        idx = h[..., None] + np.arange(self.max_probe)
        rows = self.table[idx]
        fps = self.table_fp[idx]
        empty = rows < 0
        empty_before = np.cumsum(empty, axis=-1) - empty > 0
        hit = (fps == fp[..., None]) & ~empty & ~empty_before
        any_hit = hit.any(axis=-1)
        first = hit.argmax(axis=-1)
        row = np.take_along_axis(rows, first[..., None], axis=-1)[..., 0]
        return np.where(any_hit, row, self.sentinel)

    def nearest_point(self, queries, max_dist):
        """Nearest map point in the 27-voxel cube; (target [N,3], valid [N])."""
        c = np.floor(queries / self.voxel_size).astype(np.int64)
        nb = c[:, None, :] + self._offsets[None, :, :]
        rows = self.lookup(nb)                              # [N,27]
        cand = self.points[rows]                            # [N,27,M,3]
        d2 = np.einsum(
            "nkmi,nkmi->nkm",
            cand - queries[:, None, None, :],
            cand - queries[:, None, None, :],
        )
        d2f = d2.reshape(len(queries), -1)
        best = np.argmin(d2f, axis=1)
        best_d2 = d2f[np.arange(len(queries)), best]
        m = cand.shape[2]
        tgt = cand.reshape(len(queries), -1, 3)[np.arange(len(queries)), best]
        valid = best_d2 < max_dist * max_dist
        return np.where(valid[:, None], tgt, queries), valid


def voxel_downsample_np(points, voxel_size):
    keys = np.floor(points / voxel_size).astype(np.int64) + (1 << 20)
    packed = (keys[:, 0] << 42) | (keys[:, 1] << 21) | keys[:, 2]
    _, first = np.unique(packed, return_index=True)
    return points[np.sort(first)]


def deskew_np(points, rel_times, imu_t, imu_gyro, scan_cur, scan_end,
              odom_incre):
    """Vectorized LIO-SAM deskew to scan end (same model as deskew.py)."""
    inc = (imu_t >= scan_cur - 0.01) & (imu_t <= scan_end + 0.01)
    t_inc = imu_t[inc]
    if len(t_inc) < 2:
        return points
    g = imu_gyro[inc]
    dt = np.diff(t_inc, prepend=t_inc[0])
    rot = np.cumsum(g * dt[:, None], axis=0)
    rot -= rot[0]
    pt_t = scan_cur + rel_times
    rot_cur = np.stack(
        [np.interp(pt_t, t_inc, rot[:, k]) for k in range(3)], axis=1
    )
    rot_from_end = rot_cur - rot[-1]
    span = max(scan_end - scan_cur, 1e-9)
    ratio = rel_times / span
    pos_from_end = (ratio[:, None] - 1.0) * odom_incre[None, :]
    cr, sr = np.cos(rot_from_end[:, 0]), np.sin(rot_from_end[:, 0])
    cp, sp = np.cos(rot_from_end[:, 1]), np.sin(rot_from_end[:, 1])
    cy, sy = np.cos(rot_from_end[:, 2]), np.sin(rot_from_end[:, 2])
    # Rz Ry Rx rows applied per point
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    nx = (cy * cp) * x + (cy * sp * sr - sy * cr) * y + (cy * sp * cr + sy * sr) * z
    ny = (sy * cp) * x + (sy * sp * sr + cy * cr) * y + (sy * sp * cr - cy * sr) * z
    nz = (-sp) * x + (cp * sr) * y + (cp * cr) * z
    return np.stack([nx, ny, nz], axis=1) + pos_from_end


def _skew_batch(v):
    out = np.zeros((len(v), 3, 3))
    out[:, 0, 1] = -v[:, 2]
    out[:, 0, 2] = v[:, 1]
    out[:, 1, 0] = v[:, 2]
    out[:, 1, 2] = -v[:, 0]
    out[:, 2, 0] = -v[:, 1]
    out[:, 2, 1] = v[:, 0]
    return out


def _exp_so3(v):
    th = np.linalg.norm(v)
    if th < 1e-9:
        return np.eye(3)
    k = np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
    ) / th
    return np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * (k @ k)


def icp_p2p_np(grid: CpuVoxelGrid, src_local, init_pose, *, max_iter=10,
               max_search=5.0, lm_lambda=0.5, term=0.02, min_overlap=0.4):
    """Vectorized single-core P2P RunRegister (registration.cpp:273-418)."""
    pose = init_pose.copy()
    fitness = 0.0
    n = len(src_local)
    for _ in range(max_iter):
        src_global = src_local @ pose[:3, :3].T + pose[:3, 3]
        tgt, valid = grid.nearest_point(src_global, max_search)
        matched = int(valid.sum())
        if matched / n < min_overlap:
            return pose, False, fitness
        inv = np.linalg.inv(pose)
        tgt_local = tgt @ inv[:3, :3].T + inv[:3, 3]
        r = tgt_local - src_local
        r2 = np.einsum("ni,ni->n", r, r)
        w = (max_search**2 / (max_search + r2) ** 2) * valid
        S = _skew_batch(src_local)
        A = w[:, None, None] * np.eye(3)
        AS = np.einsum("kij,kjl->kil", A, S)
        tl = A.sum(0)
        tr = -AS.sum(0)
        br = -np.einsum("kij,kjl->il", S, AS)
        Ar = w[:, None] * r
        JTJ = np.block([[tl, tr], [tr.T, br]])
        JTr = np.concatenate([Ar.sum(0), np.einsum("kij,kj->i", S, Ar)])
        fitness = float(np.sqrt(r2[valid]).sum() / max(matched, 1))
        reg = JTJ + lm_lambda * np.diag(np.diag(JTJ))
        x = np.linalg.solve(reg, JTr)
        step = np.eye(4)
        step[:3, :3] = _exp_so3(x[3:])
        step[:3, 3] = x[:3]
        pose = pose @ step
        rot_norm = np.arccos(np.clip((np.trace(step[:3, :3]) - 1) / 2, -1, 1))
        if rot_norm + np.linalg.norm(x[:3]) < term:
            break
    return pose, True, fitness


def cpu_scan_step(grid: CpuVoxelGrid, points, rel_times, imu_t, imu_gyro,
                  scan_cur, scan_end, odom_incre, init_pose, *,
                  ds_voxel=1.5, max_dist=100.0, **icp_kw):
    """Full per-scan CPU step: range gate -> deskew -> downsample -> P2P ICP.
    Mirrors CallbackPointCloud's hot path (pcm_matching.cpp:198-299)."""
    dist = np.linalg.norm(points, axis=1)
    pts = points[dist <= max_dist]
    rel = rel_times[: len(pts)] if len(rel_times) != len(pts) else rel_times[dist <= max_dist]
    pts = deskew_np(pts, rel, imu_t, imu_gyro, scan_cur, scan_end, odom_incre)
    ds = voxel_downsample_np(pts, ds_voxel)
    return icp_p2p_np(grid, ds, init_pose, **icp_kw)
