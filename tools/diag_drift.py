"""Diagnose the fused-bench ATE drift (VERDICT round-1 weak #1).

Runs the exact bench configuration, then prints per-scan error components:
fused EKF pose vs truth, raw ICP pose vs truth, and the scan diagnostics.
Separates "ICP itself is biased" from "EKF fusion drifts".
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    pipe, log = bench.build_everything()
    state, outs = pipe.run_fused(log)
    t_abs = np.asarray(outs["ego_t_abs"])
    pos = np.asarray(outs["ego_pos"])
    rpy = np.asarray(outs["ego_rpy"])
    icp_pose = np.asarray(outs["icp_pose"])

    # truth_t == scan header stamps
    tt, tp = log.truth_t, log.truth_pos
    trpy = log.truth_rpy
    print(
        "scan |   fused err x y z  (norm) |   icp err x y z  (norm) |"
        " yaw_err(deg) | fit  ovl  it  app"
    )
    for k in range(len(log.scan_t)):
        i = int(np.argmin(np.abs(tt - t_abs[k])))
        fe = pos[k] - tp[i]
        ie = icp_pose[k, :3, 3] - tp[i]
        ye = np.degrees(
            (rpy[k, 2] - trpy[i, 2] + np.pi) % (2 * np.pi) - np.pi
        )
        print(
            f"{k:4d} | {fe[0]:+7.3f} {fe[1]:+7.3f} {fe[2]:+7.3f} "
            f"({np.linalg.norm(fe):6.3f}) | {ie[0]:+7.3f} {ie[1]:+7.3f} "
            f"{ie[2]:+7.3f} ({np.linalg.norm(ie):6.3f}) | {ye:+8.3f} | "
            f"{float(outs['fitness'][k]):.3f} {float(outs['overlap'][k]):.2f} "
            f"{int(outs['iterations'][k]):2d} {int(outs['applied'][k])}"
        )


if __name__ == "__main__":
    main()
