"""In-loop GN iteration cost: slope of run_register wall-clock vs forced
iteration count (VERDICT r4 #6 groundwork).

The round-3 split (tools/profile_icp.py) measured correspondence 1.21 ms +
tail/solve 0.07 ms amortized standalone, but ~2.6 ms per iteration inside
the real while_loop — the gap is the true sequential dependency chain
(pose -> correspondence -> solve -> pose). This re-measures the CURRENT
in-loop cost directly: termination_threshold=0 forces the loop to run
exactly ``max_iteration`` times, so the slope of wall-clock over
max_iteration IS the in-loop per-iteration cost, with no modeling.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_gn_chain.py
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from elimaloc_tpu.map.grid import voxel_downsample  # noqa: E402
from elimaloc_tpu.pipeline.log import _traj  # noqa: E402
from elimaloc_tpu.register import run_register  # noqa: E402

RTT = 0.035
R = 30


def timeit(fn, *args):
    def loop(*a):
        def body(i, c):
            r = fn(a[0] + c * 0.0, *a[1:])
            return c + jnp.sum(r.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    f = jax.jit(loop)
    float(f(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        best = min(best, (time.time() - t0 - RTT) / R)
    return best * 1e3


def main():
    pipe, log = bench.build_everything()
    st = pipe.static.icp_static
    params = pipe.params.icp
    tmap = pipe.map

    k = len(log.scan_t) - 2
    pts = jnp.asarray(log.scan_points[k])
    val = jnp.asarray(log.scan_valid[k])
    dsp, dsv, kept = jax.jit(
        lambda p, v: voxel_downsample(p, v, 1.5, pipe.static.ds_points)
    )(pts, val)
    pose_t, yaw, _, _, _ = _traj(
        np.array([float(log.scan_t[k]) - float(log.imu_t[0])]))
    init = np.eye(4, dtype=np.float32)
    c_, s_ = np.cos(yaw[0]), np.sin(yaw[0])
    init[:2, :2] = [[c_, -s_], [s_, c_]]
    init[:3, 3] = pose_t[0] + [0.1, -0.05, 0.01]
    init = jnp.asarray(init)
    print(f"ds={int(kept)} qb={st.tile_budget.qb} "
          f"slots={st.tile_budget.max_slots} "
          f"MHP={tmap.halo_points.shape[1]}", flush=True)

    # forced-iteration sweep: termination_threshold=0 makes transform_norm
    # always >= threshold, so the while_loop runs its full budget
    p_forced = dataclasses.replace(
        params, termination_threshold=jnp.zeros_like(
            params.termination_threshold))
    ts = {}
    for n_it in (1, 2, 3, 4, 6):
        st_n = dataclasses.replace(st, max_iteration=n_it)

        def reg(p, v, i0, _st=st_n):
            return run_register(p, v, tmap, i0, p_forced, _st).pose
        ts[n_it] = timeit(reg, dsp, dsv, init)
        print(f"max_iteration={n_it}: {ts[n_it]:7.3f} ms", flush=True)
    ks = sorted(ts)
    slope = np.polyfit(ks, [ts[k_] for k_ in ks], 1)
    print(f"in-loop per-iteration slope: {slope[0]:.3f} ms "
          f"(intercept {slope[1]:.3f} ms)")


if __name__ == "__main__":
    main()
