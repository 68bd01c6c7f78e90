"""Isolate the intrinsic ICP bias: static scan, truth deskew, several inits,
across correspondence backends (tile qb8 / tile qb32 / hash)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from elimaloc_tpu.map import TileQueryBudget
from elimaloc_tpu.map import grid as map_grid
from elimaloc_tpu.map.grid import voxel_downsample
from elimaloc_tpu.pipeline.log import _traj
from elimaloc_tpu.register import run_register, make_icp_static


def yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    z, o = np.zeros_like(yaw), np.ones_like(yaw)
    return np.stack(
        [np.stack([c, -s, z], -1), np.stack([s, c, z], -1),
         np.stack([z, z, o], -1)], axis=-2)


def main():
    pipe, log = bench.build_everything()
    hash_map = map_grid.to_device(pipe.built)
    t0 = float(log.imu_t[0])
    k = 8
    stamp = float(log.scan_t[k])
    raw = log.scan_points[k]
    rel_raw = log.scan_times[k]
    valid = log.scan_valid[k]
    t_abs = stamp + rel_raw.astype(np.float64)
    pos_p, yaw_p, _, _, _ = _traj(t_abs - t0)
    R_p = yaw_rot(yaw_p)
    world = np.einsum("nij,nj->ni", R_p, raw.astype(np.float64)) + pos_p
    pe, ye, _, _, _ = _traj(np.array([stamp - t0]))
    Re = yaw_rot(ye)[0]
    truth_desk = ((world - pe[0]) @ Re).astype(np.float32)
    truth_pose = np.eye(4, dtype=np.float32)
    truth_pose[:3, :3] = Re
    truth_pose[:3, 3] = pe[0]

    dsp, dsv, kept = jax.jit(
        lambda p, v: voxel_downsample(p, v, 1.5, 18432)
    )(jnp.asarray(truth_desk), jnp.asarray(valid))
    print("kept:", int(kept))

    st_qb8 = make_icp_static(pipe.cfg.pcm, backend="tile",
                             tile_budget=TileQueryBudget(qb=8, max_slots=5120))
    st_tile = make_icp_static(pipe.cfg.pcm, backend="tile",
                              tile_budget=TileQueryBudget(qb=32, max_slots=2560))
    st_hash = make_icp_static(pipe.cfg.pcm, backend="hash")

    regs = {
        "qb8": jax.jit(lambda p, v, i: run_register(p, v, pipe.map, i, pipe.params.icp, st_qb8)),
        "tile": jax.jit(lambda p, v, i: run_register(p, v, pipe.map, i, pipe.params.icp, st_tile)),
        "hash": jax.jit(lambda p, v, i: run_register(p, v, hash_map, i, pipe.params.icp, st_hash)),
    }
    offsets = [(0, 0, 0), (0.5, 0, 0), (0, 0.5, 0), (-0.5, 0, 0), (0, -0.5, 0), (0.2, -0.1, 0.02)]
    for name, reg in regs.items():
        for off in offsets:
            init = truth_pose.copy()
            init[:3, 3] += off
            res = reg(dsp, dsv, jnp.asarray(init))
            err = np.asarray(res.pose)[:3, 3] - pe[0]
            print(f"{name:7s} off={off}: err=({err[0]:+.3f},{err[1]:+.3f},"
                  f"{err[2]:+.3f}) |{np.linalg.norm(err):.3f}| "
                  f"fit={float(res.fitness):.3f} it={int(res.iterations)} "
                  f"ovl={float(res.overlap):.2f}")


if __name__ == "__main__":
    main()
