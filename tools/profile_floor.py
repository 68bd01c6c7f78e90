"""Time split of the no-ICP frame floor (VERDICT r3 weak #6 / next #3).

The round-3 ablations bound the fused frame at ~3.2 ms with ICP and deskew
off and attributed it to sequential thunk overhead. This measures the floor
CUMULATIVELY: replay the whole bench log through fused-frame variants that
stop after stage k, so each successive delta is that stage's true in-frame
sequential cost (not its standalone amortized cost).

Stages: 0 = IMU sub-scan only; 1 = +range gate/normalize; 2 = +deskew;
3 = +pose sync; 4 = +downsample; 5 = +ICP(0 iters: assign_slots+gates);
6 = +cov shaping/time comp/EKF update (full, max_iteration=0);
7 = full with real ICP.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_floor.py
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from elimaloc_tpu import deskew as deskew_mod  # noqa: E402
from elimaloc_tpu.config import GnssSource  # noqa: E402
from elimaloc_tpu.ekf import GnssMeas, update_gnss  # noqa: E402
from elimaloc_tpu.ekf.filter import ego_state  # noqa: E402
from elimaloc_tpu.map.grid import voxel_downsample  # noqa: E402
from elimaloc_tpu.ops import lie  # noqa: E402
from elimaloc_tpu.pipeline import rings  # noqa: E402
from elimaloc_tpu.pipeline.runtime import (  # noqa: E402
    _select_state, build_fused_batches, fused_frame, imu_step, imu_subbatch,
    shape_icp_covariance,
)
from elimaloc_tpu.register import run_register  # noqa: E402

RTT = 0.035


def partial_frame(st, b, tmap, pp, ps, upto: int):
    """fused_frame truncated after stage `upto` (mirrors runtime.scan_step)."""
    st = imu_subbatch(st, b, pp, ps)
    sink = [st.ekf.pos]
    out = lambda: (st, jnp.sum(jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in sink])))
    if upto == 0:
        return out()

    points, rel_raw, valid = b["scan_points"], b["scan_times"], b["scan_valid"]
    stamp = b["scan_t"] - pp.lidar_time_delay
    dist = jnp.linalg.norm(points, axis=1)
    valid = valid & (dist <= pp.input_max_dist)
    rel, scan_cur, scan_end = deskew_mod.normalize_scan_times(
        rel_raw, valid, stamp, ps.scan_time_end)
    sink = [scan_end, jnp.sum(valid)]
    if upto == 1:
        return out()

    imu_r, ego_r = st.imu_ring, st.ego_ring
    info = deskew_mod.make_deskew_info(
        imu_r.t, imu_r.gyro, imu_r.valid_mask(),
        ego_r.t, ego_r.pos, ego_r.rpy, ego_r.vel_local, ego_r.gyro,
        ego_r.valid_mask(), scan_cur, scan_end)
    pts_d, desk_ok = deskew_mod.deskew_points(
        points, rel, valid, info,
        run_deskew=ps.run_deskew, bug_compat_z=ps.bug_compat_deskew_z)
    sink = [pts_d[0], desk_ok]
    if upto == 2:
        return out()

    sync_pose, found = rings.get_interpolated_pose(ego_r, scan_end)
    usable = desk_ok & found & (ego_r.count > 0)
    sink = [sync_pose, usable]
    if upto == 3:
        return out()

    ds_pts, ds_valid, ds_kept = voxel_downsample(
        pts_d, valid, pp.input_voxel_ds, ps.ds_points)
    sink = [ds_pts[0], ds_kept]
    if upto == 4:
        return out()

    icp_params = pp.icp
    icp_static = ps.icp_static
    if upto <= 6:
        icp_static = dataclasses.replace(icp_static, max_iteration=0)
    init_guess = lie.compose(sync_pose, pp.tf_ego_to_lidar)
    res = run_register(ds_pts, ds_valid, tmap, init_guess, icp_params, icp_static)
    sink = [res.pose, res.success]
    if upto == 5:
        return out()

    icp_ego_pose = lie.compose(res.pose, pp.tf_lidar_to_ego)
    rot_ego = icp_ego_pose[:3, :3]
    quat = lie.rot_to_quat(rot_ego)
    pos_cov, rot_cov = shape_icp_covariance(rot_ego, res.local_cov, res.fitness)
    ct, cpos, cquat, comp_ok = rings.gnss_time_compensation(
        ego_r, scan_end, icp_ego_pose[:3, 3], quat)
    meas = GnssMeas(timestamp=ct, source=jnp.asarray(int(GnssSource.PCM)),
                    pos=cpos, rot=cquat,
                    pos_cov=pos_cov.astype(points.dtype),
                    rot_cov=rot_cov.astype(points.dtype))
    apply = usable & res.success & comp_ok & ps.use_pcm
    ekf2 = update_gnss(st.ekf, meas, pp.ekf, ps.ekf_flags)
    st = _select_state(apply, st.replace(ekf=ekf2), st)
    es = ego_state(st.ekf)
    sink = [es["pos"], es["timestamp"]]
    return out()


def main():
    pipe, log = bench.build_everything()
    st0 = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = jax.device_put(
        build_fused_batches(log, time_base=pipe.time_base))
    n = len(log.scan_t)
    pp, ps = pipe.params, pipe.static

    def timed(replay, label):
        o = replay(st0, batches, pipe.map)
        float(jnp.sum(o[1]))
        best = np.inf
        for _ in range(4):
            t0 = time.time()
            o = replay(st0, batches, pipe.map)
            float(jnp.sum(o[1]))
            best = min(best, max(time.time() - t0 - RTT, 1e-9))
        ms = best / n * 1e3
        print(f"{label:42s} {ms:7.3f} ms/frame   {n / best:7.1f} scans/s",
              flush=True)
        return ms

    labels = ["0 imu sub-scan only", "1 +range gate/normalize", "2 +deskew",
              "3 +pose sync", "4 +downsample", "5 +icp(0it) slots+gates",
              "6 +covshape/timecomp/EKF (no GN iters)", "7 full (real ICP)"]
    prev = 0.0
    for k in range(8):
        def replay(st, bt, tm, _k=k):
            def body(s, b):
                s2, o = partial_frame(s, b, tm, pp, ps, _k)
                return s2, o
            return jax.lax.scan(body, st, bt)
        r = jax.jit(replay)
        ms = timed(r, labels[k])
        if k:
            print(f"{'':42s} delta {ms - prev:+7.3f} ms")
        prev = ms


if __name__ == "__main__":
    main()
