"""Sweep: fused-vs-isolated gap + tile-budget (qb) tuning at 131k scale."""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from elimaloc_tpu.map import TileQueryBudget
from elimaloc_tpu.map.grid import voxel_downsample
from elimaloc_tpu.pipeline.log import _traj
from elimaloc_tpu.register import run_register

RTT = 0.035


def main():
    pipe, log = bench.build_everything()
    n_scans = len(log.scan_t)

    def fused_time(ps, tag):
        fn = jax.jit(
            lambda s, b, m: __import__(
                "elimaloc_tpu.pipeline.runtime", fromlist=["replay_fused"]
            ).replay_fused(s, b, m, pipe.params, ps)
        )
        from elimaloc_tpu.pipeline.runtime import build_fused_batches
        state = pipe.reset()
        pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
        batches = build_fused_batches(log, time_base=pipe.time_base)
        s, o = fn(state, batches, pipe.map)
        float(jnp.sum(o["ego_pos"]))
        t0 = time.time()
        s, o = fn(state, batches, pipe.map)
        float(jnp.sum(o["ego_pos"]))
        dt = time.time() - t0 - RTT
        it = np.asarray(o["iterations"])
        print(f"fused[{tag}]: {n_scans/dt:.2f} scans/s "
              f"({dt/n_scans*1e3:.1f} ms/frame) iters={list(it)}", flush=True)

    fused_time(pipe.static, "qb8 it10")

    it1 = dataclasses.replace(
        pipe.static,
        icp_static=dataclasses.replace(pipe.static.icp_static,
                                       max_iteration=1))
    fused_time(it1, "qb8 it1")

    qb32 = dataclasses.replace(
        pipe.static,
        icp_static=dataclasses.replace(
            pipe.static.icp_static,
            tile_budget=TileQueryBudget(qb=32, max_slots=1536)))
    fused_time(qb32, "qb32 it10")

    # isolated run_register qb sweep at truth-ish init
    k = n_scans - 2
    t0_log = float(log.imu_t[0])
    pts = jnp.asarray(log.scan_points[k])
    val = jnp.asarray(log.scan_valid[k])
    dsp, dsv, kept = jax.jit(
        lambda p, v: voxel_downsample(p, v, 1.5, 16384))(pts, val)
    pose_t, yaw, _, _, _ = _traj(np.array([float(log.scan_t[k]) - t0_log]))
    T = np.eye(4, dtype=np.float32)
    c_, s_ = np.cos(yaw[0]), np.sin(yaw[0])
    T[:2, :2] = [[c_, -s_], [s_, c_]]
    T[:3, 3] = pose_t[0] + [0.3, -0.2, 0.02]
    R = 20
    for qb, slots in [(8, 4096), (16, 2048), (32, 1536), (64, 1280),
                      (128, 640)]:
        st = dataclasses.replace(
            pipe.static.icp_static,
            tile_budget=TileQueryBudget(qb=qb, max_slots=slots))

        def reg_f(p, v, i0):
            def rep(i, c):
                res = run_register(p, v, pipe.map, i0.at[0, 3].add(c * 0.0),
                                   pipe.params.icp, st)
                return (c + jnp.sum(res.pose) * 1e-12
                        + res.iterations.astype(jnp.float32) * 1e-6)
            return jax.lax.fori_loop(0, R, rep, jnp.asarray(0.0, jnp.float32))

        f = jax.jit(reg_f)
        float(f(dsp, dsv, jnp.asarray(T)))
        t0 = time.time()
        out = float(f(dsp, dsv, jnp.asarray(T)))
        dt = (time.time() - t0 - RTT) / R
        iters = (out % 1e-3) / 1e-6
        print(f"run_register qb={qb} slots={slots}: "
              f"{dt*1e3:.2f} ms (iters~{iters:.0f})", flush=True)


if __name__ == "__main__":
    main()
