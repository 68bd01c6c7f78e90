"""Per-stage wall-clock of the fused per-frame pipeline at bench shapes.

Times each stage amortized over an in-device fori_loop (block_until_ready is
a no-op on axon; read back a scalar and subtract the ~35 ms RTT).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from elimaloc_tpu.ekf import ImuMeas, predict_imu
from elimaloc_tpu.map import tiles as maptiles
from elimaloc_tpu.map.grid import voxel_downsample
from elimaloc_tpu.pipeline.runtime import build_fused_batches, scan_step, imu_step
from elimaloc_tpu.register import run_register
from elimaloc_tpu import deskew as dk

RTT = 0.035


def timeit(f, *args, reps=1):
    out = f(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))) if hasattr(x, "astype") else x,
        jax.tree_util.tree_leaves(out)[0],
    )
    t0 = time.time()
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return max(time.time() - t0 - RTT, 0.0) / reps


def main():
    pipe, log = bench.build_everything()
    pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    jax.config.update("jax_platforms", None) if False else None
    batches = build_fused_batches(log, time_base=pipe.time_base)
    k = 8
    b = {key: v[k] for key, v in batches.items()}
    pts = b["scan_points"]
    val = b["scan_valid"]
    n_imu = b["imu_t"].shape[0]
    print(f"imu window per frame: {n_imu}")

    st = pipe.reset()
    # warm the rings with IMU + one scan (cheaper than a full fused warmup)
    for k in range(40):
        st = pipe._imu_step(
            st, jnp.asarray(0.01 * (k + 1), jnp.float32),
            jnp.asarray(log.imu_acc[k], jnp.float32),
            jnp.asarray(log.imu_gyro[k], jnp.float32))
    st, _ = pipe._scan_step(
        st, b["scan_t"], pts, b["scan_times"], val, pipe.map)

    R = 20

    # 1. EKF imu sub-scan (window of n_imu steps), R reps
    def ekf_win(s0):
        def rep(i, s):
            def body(ss, x):
                t, acc, gyro, v = x
                s2 = imu_step(ss, t + i * 0.0, acc, gyro, pipe.params, pipe.static)
                return jax.tree_util.tree_map(
                    lambda a_, b_: jnp.where(v, a_, b_), s2, ss), None
            return jax.lax.scan(
                body, s, (b["imu_t"], b["imu_acc"], b["imu_gyro"], b["imu_valid"]))[0]
        return jax.lax.fori_loop(0, R, rep, s0).ekf.pos

    print(f"imu sub-scan ({n_imu} steps): "
          f"{timeit(jax.jit(ekf_win), st, reps=R)*1e3:.2f} ms")

    # 2. downsample 26k -> 8192
    def ds(p, v):
        def rep(i, c):
            o, ov, kk = voxel_downsample(p + c * 0.0, v, 1.5, 8192)
            return jnp.sum(o) * 1e-20 + kk.astype(p.dtype) * 0.0
        return jax.lax.fori_loop(0, R, rep, jnp.asarray(0.0, pts.dtype))

    print(f"voxel_downsample (26k pts): {timeit(jax.jit(ds), pts, val, reps=R)*1e3:.2f} ms")

    # 3. deskew 26k points
    imu_r = st.imu_ring
    ego_r = st.ego_ring
    rel, scan_cur, scan_end = dk.normalize_scan_times(
        b["scan_times"], val, b["scan_t"], True)

    def desk(p):
        def rep(i, c):
            info = dk.make_deskew_info(
                imu_r.t, imu_r.gyro, imu_r.valid_mask(),
                ego_r.t, ego_r.pos, ego_r.rpy, ego_r.vel_local, ego_r.gyro,
                ego_r.valid_mask(), scan_cur + c * 0.0, scan_end)
            o, ok = dk.deskew_points(p, rel, val, info)
            return c + jnp.sum(o) * 1e-20
        return jax.lax.fori_loop(0, R, rep, jnp.asarray(0.0, pts.dtype))

    print(f"deskew (26k pts): {timeit(jax.jit(desk), pts, reps=R)*1e3:.2f} ms")

    # 4. assign_slots of 8192
    dsp, dsv, _ = jax.jit(lambda p, v: voxel_downsample(p, v, 1.5, 8192))(pts, val)

    def asg_f(p, v):
        def rep(i, c):
            a = maptiles.assign_slots(pipe.map, p + c * 0.0, v,
                                      pipe.static.icp_static.tile_budget)
            return c + jnp.sum(a.qbuf) * 1e-20
        return jax.lax.fori_loop(0, R, rep, jnp.asarray(0.0, pts.dtype))

    print(f"assign_slots (8192): {timeit(jax.jit(asg_f), dsp, dsv, reps=R)*1e3:.2f} ms")

    # 5. full run_register
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = np.asarray(st.ekf.pos)

    def reg_f(p, v, i0):
        def rep(i, c):
            res = run_register(p, v, pipe.map, i0.at[0, 3].add(c * 0.0),
                               pipe.params.icp, pipe.static.icp_static)
            return c + jnp.sum(res.pose) * 1e-20
        return jax.lax.fori_loop(0, R, rep, jnp.asarray(0.0, pts.dtype))

    print(f"run_register: {timeit(jax.jit(reg_f), dsp, dsv, jnp.asarray(init), reps=R)*1e3:.2f} ms")

    # 6. full scan_step
    def sc_f(s0, p):
        def rep(i, c):
            s2, out = scan_step(s0, b["scan_t"] + c * 0.0, p, b["scan_times"],
                                val, pipe.map, pipe.params, pipe.static)
            return c + jnp.sum(out["icp_pose"]) * 1e-20
        return jax.lax.fori_loop(0, R, rep, jnp.asarray(0.0, pts.dtype))

    print(f"scan_step (full): {timeit(jax.jit(sc_f), st, pts, reps=R)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
