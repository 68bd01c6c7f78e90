"""Feasibility probe: would warm-starting ICP with the previous scan's
correction reduce init error (and hence GN iterations)?

Instruments the f64 CPU oracle's icp_np to record (init, final) per scan on
a bench-shaped log, then compares cold init error vs warm init error
(previous world-frame correction pre-applied). Pure CPU, no package change.
"""
import sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import numpy as np

from elimaloc_tpu.config import ElimalocConfig, IcpMethod
from elimaloc_tpu.map.builder import build_voxel_map
from elimaloc_tpu.pipeline.log import make_world, synthesize_log
import elimaloc_tpu.reference_cpu as rc

world = make_world(seed=7, extent=60.0, n_ground=150_000, n_wall=80_000)
log = synthesize_log(world, duration=1.8, points_per_scan=16384,
                     max_range=60.0, seed=8)
built = build_voxel_map(world, 1.0, 30, compute_voxel_cov=False,
                        compute_point_cov=False, use_native=True)

cfg = ElimalocConfig()
cfg.pcm.icp_method = IcpMethod.P2P
cfg.pcm.input_voxel_ds_m = 1.0
cfg.ekf.ekf_init_x_m = 0.0

rec = []
orig_icp = rc.icp_np


def spy(grid, src_local, init_pose, p):
    out = orig_icp(grid, src_local, init_pose, p)
    rec.append((init_pose.copy(), out[0].copy()))
    return out


rc.icp_np = spy
pipe = rc.CpuPipeline(cfg, built)
traj = pipe.run(log)
rc.icp_np = orig_icp

print(f"{len(rec)} registrations recorded")


def log_se3(T):
    r = rc._log_so3(T[:3, :3])
    return np.concatenate([T[:3, 3], r])


# world-frame correction: final = delta @ init  ->  delta = final @ inv(init)
deltas = []
for init, fin in rec:
    deltas.append(fin @ np.linalg.inv(init))

cold, warm = [], []
for k in range(1, len(rec)):
    init, fin = rec[k]
    e_cold = log_se3(fin @ np.linalg.inv(init))
    warm_init = deltas[k - 1] @ init
    e_warm = log_se3(fin @ np.linalg.inv(warm_init))
    cold.append(e_cold)
    warm.append(e_warm)

cold = np.array(cold)
warm = np.array(warm)
nc = np.linalg.norm(cold[:, :3], axis=1) + np.linalg.norm(cold[:, 3:], axis=1)
nw = np.linalg.norm(warm[:, :3], axis=1) + np.linalg.norm(warm[:, 3:], axis=1)
print("per-scan init error (|t| + |rot|, the termination metric):")
print(f"  cold: median {np.median(nc)*1e3:.2f} mm+mrad, "
      f"mean {nc.mean()*1e3:.2f}, p90 {np.percentile(nc, 90)*1e3:.2f}")
print(f"  warm: median {np.median(nw)*1e3:.2f} mm+mrad, "
      f"mean {nw.mean()*1e3:.2f}, p90 {np.percentile(nw, 90)*1e3:.2f}")
th = cfg.pcm.icp_termination_threshold_m
print(f"termination threshold: {th}")
print(f"  frames with cold err > th (need >=2 iters): {(nc > th).sum()}/{len(nc)}")
print(f"  frames with warm err > th               : {(nw > th).sum()}/{len(nw)}")
print(f"  warm/cold error ratio median: {np.median(nw / np.maximum(nc, 1e-12)):.3f}")
