"""Per-iteration ICP stage split (VERDICT r2 item 10).

The reference times each correspondence pass inside RunRegister
(registration.cpp:307-347, 393-403). On TPU, wall-clock probes cannot run
inside a jitted while_loop, so the equivalent telemetry is iteration-count x
stage decomposition: each stage of one Gauss-Newton iteration (slot
assignment, correspondence, GN tails + LM solve) is compiled and timed in
isolation at the exact shapes the fused pipeline uses, then combined with
the measured per-frame iteration counts.

Run: python tools/profile_icp.py [method]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from elimaloc_tpu.config import IcpMethod
from elimaloc_tpu.map import tiles as T
from elimaloc_tpu.map.grid import voxel_downsample
from elimaloc_tpu.pipeline.log import _traj
from elimaloc_tpu.register import run_register
from elimaloc_tpu.register import icp as icp_mod

RTT = 0.035
R = 30


def timeit(fn, *args):
    """Amortized wall-clock: in-device fori_loop with a carry dependency
    (block_until_ready is a no-op on the axon relay)."""
    def loop(*a):
        def body(i, c):
            r = fn(a[0] + c * 0.0, *a[1:])
            first = jax.tree_util.tree_leaves(r)[0]
            return c + jnp.sum(first.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    f = jax.jit(loop)
    float(f(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        float(f(*args))
        best = min(best, (time.time() - t0 - RTT) / R)
    return best * 1e3


def main():
    method = IcpMethod[sys.argv[1]] if len(sys.argv) > 1 else IcpMethod.P2P
    pipe, log = bench.build_everything()
    st = pipe.static.icp_static
    budget = st.tile_budget
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
    print(f"method={method.name} ds={int(kept)} qb={budget.qb} "
          f"slots={budget.max_slots} MHP={tmap.halo_points.shape[1]}",
          flush=True)

    # stage 1: slot assignment (once per registration, hoisted)
    def assign(p, v):
        return T.assign_slots(tmap, p, v, budget)
    world = jnp.einsum("ij,kj->ki", init[:3, :3], dsp) + init[:3, 3]
    t_assign = timeit(assign, world, dsv)
    asg = jax.jit(assign)(world, dsv)

    # stage 2: the correspondence pass (per iteration)
    md = params.max_search_dist
    if method == IcpMethod.P2P:
        corr = lambda qb_, qv, qm, stile: T.nearest_point_slots(
            tmap, stile, qb_, qv, qm, md, budget)
    elif method == IcpMethod.GICP:
        corr = lambda qb_, qv, qm, stile: T.nearest_point_slots(
            tmap, stile, qb_, qv, qm, md, budget, with_point_cov=True)
    elif method == IcpMethod.VGICP:
        corr = lambda qb_, qv, qm, stile: T.nearest_voxel_cov_slots(
            tmap, stile, qb_, qv, qm, md, budget)
    else:
        corr = lambda qb_, qv, qm, stile: T.all_voxel_cov_slots(
            tmap, stile, qb_, qv, qm, md, budget)
    t_corr = timeit(corr, asg.qbuf, asg.qvox, asg.qmask, asg.slot_tile)

    # stage 3: GN tail + solve (per iteration) — approximated by the P2P
    # tail at the same row count (the tails share the einsum structure)
    tgt, ok = jax.jit(
        lambda qb_, qv, qm, stile: T.nearest_point_slots(
            tmap, stile, qb_, qv, qm, md, budget)
    )(asg.qbuf, asg.qvox, asg.qmask, asg.slot_tile)
    n = dsp.shape[0]
    target, valid = jax.jit(
        lambda t_, o: tuple(T._scatter_back(
            n, asg.qidx, (dsp[0] * 0.0, t_), (jnp.asarray(False), o)))
    )(tgt, ok)

    def tail(p, t_, v):
        m_, JTJ, JTr, fit = icp_mod._p2p_tail(init, p, t_, v, params)
        x, _ = icp_mod._solve_step(JTJ, JTr, params.lm_lambda)
        return x
    t_tail = timeit(tail, dsp, target, valid)

    # whole registration for calibration
    def reg(p, v, i0):
        return run_register(p, v, tmap, i0, params, st).pose
    res = jax.jit(lambda p, v, i0: run_register(p, v, tmap, i0, params, st))(
        dsp, dsv, init)
    iters = int(res.iterations)
    t_reg = timeit(reg, dsp, dsv, init)

    per_iter = t_corr + t_tail
    print(f"assign_slots (once):        {t_assign:7.3f} ms")
    print(f"correspondence (per iter):  {t_corr:7.3f} ms")
    print(f"GN tail + solve (per iter): {t_tail:7.3f} ms")
    print(f"=> model: {t_assign:.2f} + it x {per_iter:.2f} ms; measured "
          f"run_register = {t_reg:.2f} ms at {iters} iters "
          f"(model {t_assign + iters * per_iter:.2f} ms)")


if __name__ == "__main__":
    main()
