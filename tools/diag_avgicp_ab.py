"""Same-session AVGICP A/B: halo_margin=2 hoisted assignment vs the round-4
per-iteration reassign (VERDICT r4 next #4).

Round 4 fixed the AVGICP tile-assignment bias (halo-edge candidates lost to a
stale initial-guess slot assignment — reference semantics re-look-up tiles
from the CURRENT pose each GN iteration, registration.cpp:310-347 +
voxel_hash_map.cpp:153-206) by re-running the full sort+pack every iteration,
which made AVGICP the slowest method (27.3 scans/s official r4). Round 5
replaces that with a build-time halo margin of 2 voxels
(map/tiles._halo_membership): the wider halo keeps the HOISTED assignment's
candidate set a superset of the reassigned one for up to a voxel of GN pose
drift, so parity holds at hoisted speed.

This tool measures BOTH variants in one session on the bench methods log
(fused AVGICP replay, best-of-3) and their f64-oracle trajectory parity —
the cross-round r4-vs-r5 comparison would otherwise be hostage to the
1.5-2x shared-host variance documented in BENCH_NOTES.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_avgicp_ab.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from elimaloc_tpu.config import IcpMethod  # noqa: E402
from elimaloc_tpu.map import TileQueryBudget  # noqa: E402
from elimaloc_tpu.map.builder import build_voxel_map  # noqa: E402
from elimaloc_tpu.pipeline import (  # noqa: E402
    LocalizationPipeline, ate_rmse, make_world, synthesize_log,
)
from elimaloc_tpu.reference_cpu import CpuPipeline  # noqa: E402


def main():
    world = bench.make_world(seed=7, extent=60.0,
                             n_ground=150_000, n_wall=80_000)
    log = synthesize_log(world, duration=(bench.METHOD_SCANS + 3) * 0.1,
                         points_per_scan=16384, max_range=60.0, seed=8)
    built = build_voxel_map(world, 1.0, 30, compute_voxel_cov=True,
                            compute_point_cov=False, use_native=True)
    cfg = bench._cfg(IcpMethod.AVGICP)

    oracle_traj = None
    results = {}
    for tag, margin in (("halo2_hoisted", 2), ("reassign_r4", 1)):
        pipe = LocalizationPipeline(
            cfg, built, ds_points=4096,
            tile_budget=TileQueryBudget(qb=16, max_slots=1024),
            ego_ring_size=512, imu_ring_size=256, halo_margin=margin,
        )
        assert pipe.static.icp_static.reassign_each_iter == (margin == 1), tag
        state, outs = pipe.run_fused(log)
        float(jnp.sum(outs["ego_pos"]))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            state, outs = pipe.run_fused(log)
            float(jnp.sum(outs["ego_pos"]))
            best = min(best, max(time.time() - t0 - bench.RTT, 1e-9))
        pos = np.asarray(outs["ego_pos"])
        t_abs = np.asarray(outs["ego_t_abs"])
        if oracle_traj is None:
            oracle = CpuPipeline(cfg, built, ego_ring_size=512,
                                 imu_ring_size=256)
            oracle_traj = oracle.run(log, time_base=pipe.time_base,
                                     frame_ordered=True)
        n = min(len(pos), len(oracle_traj["pos"]))
        err = np.linalg.norm(pos[:n] - oracle_traj["pos"][:n], axis=1)
        results[tag] = dict(
            scans_per_s=round(len(log.scan_t) / best, 2),
            oracle_parity_ate_m=round(float(np.sqrt(np.mean(err ** 2))), 5),
            ate_m=round(ate_rmse(t_abs, pos, log.truth_t, log.truth_pos), 4),
            applied=round(float(np.asarray(outs["applied"]).mean()), 3),
            gn_iters=round(float(np.asarray(outs["iterations"]).mean()), 2),
        )
        print(tag, results[tag], flush=True)

    a, b = results["halo2_hoisted"], results["reassign_r4"]
    print(f"speedup halo2/reassign: "
          f"{a['scans_per_s'] / b['scans_per_s']:.2f}x; "
          f"parity {a['oracle_parity_ate_m'] * 1e3:.1f} vs "
          f"{b['oracle_parity_ate_m'] * 1e3:.1f} mm", flush=True)


if __name__ == "__main__":
    main()
