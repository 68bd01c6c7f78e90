"""Is speculative two-iteration GN batching worth it? (VERDICT r4 #6)

The idea: compute iteration k+1's correspondence from iteration k's
PREDICTED pose alongside iteration k's search (one vmapped 2-pose search),
then select on the real pose — halving while_loop trips when the
prediction holds. Whether it can win reduces to two measured numbers:

  * the in-loop per-iteration cost (tools/diag_gn_chain.py slope), and
  * the marginal cost of widening the slot search from 1 to 2 poses
    (this tool): a sequential chain of vmapped ``_search_slots`` +
    ``_tails_from_matches`` at pose width P in {1, 2}.

With trip cost t1 (width 1) and t2 (width 2), speculation wins per
registration only if  n_trips_spec * t2 < n_iters * t1  where
n_trips_spec = ceil(n_iters / 2) on perfect prediction. At the bench's
average 1.6-1.7 iterations, most registrations run 1-2 iterations:
1-iteration frames pay t2 for t1's work, and 2-iteration frames need
t2 < 2*t1 merely to break even — so the method needs t2/t1 well under
~1.2 to win on average. The search's dense [QB, MH] distance expansion
dominates the iteration and scales linearly in pose width, so the
expected t2/t1 is ~1.6-1.9 (measured below).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_spec2.py
"""
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
from elimaloc_tpu.ops import lie  # noqa: E402
from elimaloc_tpu.pipeline.log import _traj  # noqa: E402
from elimaloc_tpu.register import icp  # noqa: E402

RTT = 0.035
R = 30


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

    # hoisted assignment exactly like run_register's tile path
    asg = __import__(
        "elimaloc_tpu.map.tiles", fromlist=["assign_slots"]
    ).assign_slots(tmap, lie.transform_points(init, dsp), dsv,
                   st.tile_budget)
    n = dsp.shape[0]
    safe_idx = jnp.minimum(asg.qidx, n - 1)
    sbuf = jnp.where(asg.qmask[..., None], dsp[safe_idx], 0.0)
    print(f"ds={int(kept)} qb={st.tile_budget.qb} "
          f"slots={st.tile_budget.max_slots}", flush=True)

    def chain(width):
        """Sequential chain of ``R`` search+tails rounds at pose width."""
        def one(pose):
            m = icp._search_slots(pose, sbuf, asg, tmap, params, st)
            matched, JTJ, JTr, fit = icp._tails_from_matches(
                pose, sbuf, m, params, st, None)
            return JTr / jnp.maximum(matched, 1)

        def body(i, p):
            if width == 1:
                d = one(p)
            else:
                # pose + predicted pose: vmapped 2-wide search, consume one
                poses = jnp.stack([p, p.at[:3, 3].add(0.01)])
                d = jax.vmap(one)(poses)[0]
            return p.at[:3, 3].add(d[:3] * 1e-9)

        return jax.jit(lambda p: jax.lax.fori_loop(0, R, body, p))

    for width in (1, 2):
        f = chain(width)
        jax.block_until_ready(f(init))
        float(f(init)[0, 0])  # host readback forces completion on axon
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            float(f(init)[0, 0])
            best = min(best, (time.time() - t0 - RTT) / R)
        print(f"width={width}: {best * 1e3:7.3f} ms/round", flush=True)
        if width == 1:
            t1 = best
        else:
            t2 = best
    print(f"t2/t1 = {t2 / t1:.2f}  (speculation needs < ~1.2 to win at the "
          f"bench's 1.6-1.7 avg iterations)")


if __name__ == "__main__":
    main()
