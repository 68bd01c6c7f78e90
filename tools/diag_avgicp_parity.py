"""Per-registration AVGICP f32-vs-f64 gap (VERDICT r3 next #4).

The bench parity metric (oracle_parity_ate_m) is a closed-loop trajectory
RMSE, which amplifies per-step divergence through the EKF. This isolates the
per-REGISTRATION gap: identical downsampled clouds + identical inits through
(a) the TPU f32 tile engine, (b) the TPU f32 hash engine, and (c) the f64
NumPy oracle (reference_cpu.icp_np), across scans and init perturbations.
Prints the translation gap TPU-vs-oracle per case + summary stats, for
AVGICP and (as control) VGICP.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_avgicp_parity.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from elimaloc_tpu.config import IcpMethod  # noqa: E402
from elimaloc_tpu.map import TileQueryBudget  # noqa: E402
from elimaloc_tpu.map import grid as map_grid  # noqa: E402
from elimaloc_tpu.map.builder import build_voxel_map  # noqa: E402
from elimaloc_tpu.map.grid import voxel_downsample  # noqa: E402
from elimaloc_tpu.map import tiles as map_tiles  # noqa: E402
from elimaloc_tpu.pipeline import make_world, synthesize_log  # noqa: E402
from elimaloc_tpu.pipeline.log import _traj  # noqa: E402
from elimaloc_tpu.reference_cpu import (  # noqa: E402
    CpuVoxelGrid, IcpNpParams, icp_np,
)
from elimaloc_tpu.register import (  # noqa: E402
    make_icp_params, make_icp_static, run_register,
)


def yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    z, o = np.zeros_like(yaw), np.ones_like(yaw)
    return np.stack(
        [np.stack([c, -s, z], -1), np.stack([s, c, z], -1),
         np.stack([z, z, o], -1)], axis=-2)


def main():
    # bench_methods' world/log/map (bench.py:bench_methods)
    world = make_world(seed=7, extent=60.0, n_ground=150_000, n_wall=80_000)
    log = synthesize_log(world, duration=2.0, points_per_scan=16384,
                         max_range=60.0, seed=8)
    built = build_voxel_map(world, 1.0, 30, compute_voxel_cov=True,
                            compute_point_cov=True, use_native=True)
    grid_np = CpuVoxelGrid(built)
    hash_map = map_grid.to_device(built)
    budget = TileQueryBudget(qb=16, max_slots=1024)
    tile_map = map_tiles.build_tile_map(built).to_device()

    cfg = bench._cfg(IcpMethod.AVGICP)
    t0 = float(log.imu_t[0])
    offsets = [(0.0, 0.0, 0.0), (0.3, 0.0, 0.0), (0.0, -0.3, 0.0),
               (0.15, 0.15, 0.01)]

    for method in (IcpMethod.AVGICP, IcpMethod.VGICP):
        cfg.pcm.icp_method = method
        icp_params = make_icp_params(cfg.pcm)
        st_tile = make_icp_static(cfg.pcm, backend="tile", tile_budget=budget)
        st_hash = make_icp_static(cfg.pcm, backend="hash")
        reg_tile = jax.jit(lambda p, v, i, _s=st_tile: run_register(
            p, v, tile_map, i, icp_params, _s))
        reg_hash = jax.jit(lambda p, v, i, _s=st_hash: run_register(
            p, v, hash_map, i, icp_params, _s))
        p_np = IcpNpParams(
            method=int(method), max_iter=cfg.pcm.max_iteration,
            max_search=cfg.pcm.max_search_dist, lm_lambda=cfg.pcm.lm_lambda,
            term=cfg.pcm.icp_termination_threshold_m,
            min_overlap=cfg.pcm.min_overlap_ratio,
            max_fitness=cfg.pcm.max_fitness_score,
        )
        gaps_t, gaps_h = [], []
        for k in (4, 8, 12, 16):
            stamp = float(log.scan_t[k])
            raw, rel_raw = log.scan_points[k], log.scan_times[k]
            valid = log.scan_valid[k]
            t_abs = stamp + rel_raw.astype(np.float64)
            pos_p, yaw_p, _, _, _ = _traj(t_abs - t0)
            R_p = yaw_rot(yaw_p)
            w = np.einsum("nij,nj->ni", R_p, raw.astype(np.float64)) + pos_p
            pe, ye, _, _, _ = _traj(np.array([stamp - t0]))
            Re = yaw_rot(ye)[0]
            truth_desk = ((w - pe[0]) @ Re).astype(np.float32)
            truth_pose = np.eye(4)
            truth_pose[:3, :3] = Re
            truth_pose[:3, 3] = pe[0]
            dsp, dsv, _ = jax.jit(
                lambda p, v: voxel_downsample(
                    p, v, float(cfg.pcm.input_voxel_ds_m), 4096)
            )(jnp.asarray(truth_desk), jnp.asarray(valid))
            dsp_np = np.asarray(dsp, np.float64)[np.asarray(dsv)]
            for off in offsets:
                init = truth_pose.copy()
                init[:3, 3] += off
                pose_np, ok_np, _, _ = icp_np(grid_np, dsp_np, init, p_np)
                r_t = reg_tile(dsp, dsv, jnp.asarray(init, jnp.float32))
                r_h = reg_hash(dsp, dsv, jnp.asarray(init, jnp.float32))
                gt = np.linalg.norm(
                    np.asarray(r_t.pose, np.float64)[:3, 3] - pose_np[:3, 3])
                gh = np.linalg.norm(
                    np.asarray(r_h.pose, np.float64)[:3, 3] - pose_np[:3, 3])
                gaps_t.append(gt)
                gaps_h.append(gh)
                print(f"{method.name:7s} k={k:2d} off={off}: "
                      f"tile-vs-f64 {gt * 1e3:7.3f} mm  "
                      f"hash-vs-f64 {gh * 1e3:7.3f} mm  "
                      f"(ok {bool(ok_np)}/{bool(r_t.success)})", flush=True)
        gt, gh = np.array(gaps_t) * 1e3, np.array(gaps_h) * 1e3
        print(f"== {method.name}: tile med {np.median(gt):.3f} "
              f"max {gt.max():.3f} mm | hash med {np.median(gh):.3f} "
              f"max {gh.max():.3f} mm", flush=True)


if __name__ == "__main__":
    main()
