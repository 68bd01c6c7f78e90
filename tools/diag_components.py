"""Component isolation for the ATE drift: deskew model error vs ICP bias.

For a range of scans at bench scale:
  (a) ICP on TRUTH-deskewed points, truth init, ds budget 8192 (bench budget)
  (b) same but ds budget 18k (no downsample overflow)
  (c) ICP on PIPELINE-deskewed points (deskew fed with TRUTH rings), ds 18k
  (d) deskew displacement error: pipeline-deskewed vs truth-deskewed cloud
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from elimaloc_tpu import deskew as dk
from elimaloc_tpu.map import TileQueryBudget
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
    t0 = float(log.imu_t[0])
    static2 = make_icp_static(
        pipe.cfg.pcm, backend="tile",
        tile_budget=TileQueryBudget(qb=32, max_slots=2560))

    ds_fn = jax.jit(lambda p, v, n: voxel_downsample(p, v, 1.5, n),
                    static_argnums=2)
    reg = jax.jit(lambda p, v, i, st: run_register(
        p, v, pipe.map, i, pipe.params.icp, st), static_argnums=3)

    print("scan | (a)8192 err,fit,it | (b)18k err,fit,it | (c)pipe-deskew "
          "err,fit,it | (d)deskew rms | kept")
    for k in range(4, 26):
        stamp = float(log.scan_t[k])
        raw = log.scan_points[k]
        rel_raw = log.scan_times[k]
        valid = log.scan_valid[k]
        # absolute per-point times; truth world reconstruction
        t_abs = stamp + rel_raw.astype(np.float64)
        pos_p, yaw_p, _, _, _ = _traj(t_abs - t0)
        R_p = yaw_rot(yaw_p)
        world = np.einsum("nij,nj->ni", R_p, raw.astype(np.float64)) + pos_p
        # truth re-projection to scan-end sensor frame
        pe, ye, _, _, _ = _traj(np.array([stamp - t0]))
        Re = yaw_rot(ye)[0]
        truth_desk = ((world - pe[0]) @ Re).astype(np.float32)
        truth_pose = np.eye(4, dtype=np.float32)
        truth_pose[:3, :3] = Re
        truth_pose[:3, 3] = pe[0]
        init = truth_pose.copy()
        init[:3, 3] += [0.2, -0.1, 0.02]

        # pipeline deskew with truth rings
        m = 256
        sel = np.where(log.imu_t <= stamp + 1e-6)[0][-m:]
        it = (log.imu_t[sel] - t0).astype(np.float32)
        ig = log.imu_gyro[sel].astype(np.float32)
        iv = np.ones(len(sel), bool)
        # ego ring at imu times from truth
        ep, eyaw, evel, eyr, _ = _traj(log.imu_t[sel] - t0)
        erpy = np.c_[np.zeros((len(sel), 2)), eyaw].astype(np.float32)
        ev_local = np.c_[np.linalg.norm(evel, axis=1),
                         np.zeros((len(sel), 2))].astype(np.float32)
        egy = np.c_[np.zeros((len(sel), 2)), eyr].astype(np.float32)
        rel, scan_cur, scan_end = dk.normalize_scan_times(
            jnp.asarray(rel_raw), jnp.asarray(valid),
            jnp.asarray(stamp - t0, jnp.float32), True)
        info = dk.make_deskew_info(
            jnp.asarray(it), jnp.asarray(ig), jnp.asarray(iv),
            jnp.asarray(it), jnp.asarray(ep, jnp.float32),
            jnp.asarray(erpy), jnp.asarray(ev_local), jnp.asarray(egy),
            jnp.asarray(iv), scan_cur, scan_end)
        pipe_desk, ok = dk.deskew_points(
            jnp.asarray(raw), rel, jnp.asarray(valid), info)
        pipe_desk = np.asarray(pipe_desk)
        d_rms = float(np.sqrt(np.mean(
            np.sum((pipe_desk[valid] - truth_desk[valid]) ** 2, axis=1))))

        results = []
        for pts, budget, st in [
            (truth_desk, 8192, pipe.static.icp_static),
            (truth_desk, 18432, static2),
            (pipe_desk, 18432, static2),
        ]:
            dsp, dsv, kept = ds_fn(jnp.asarray(pts), jnp.asarray(valid), budget)
            res = reg(dsp, dsv, jnp.asarray(init), st)
            err = np.asarray(res.pose)[:3, 3] - pe[0]
            results.append(
                (np.linalg.norm(err), float(res.fitness),
                 int(res.iterations), int(kept)))
        a, b, c = results
        print(f"{k:4d} | {a[0]:6.3f} {a[1]:.3f} {a[2]:2d} | "
              f"{b[0]:6.3f} {b[1]:.3f} {b[2]:2d} | "
              f"{c[0]:6.3f} {c[1]:.3f} {c[2]:2d} | {d_rms:7.4f} | {b[3]}")


if __name__ == "__main__":
    main()
