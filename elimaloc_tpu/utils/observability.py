"""Runtime observability: the EKF dashboard and trajectory export.

Replaces the reference's rviz/plot-topic observability surface (SURVEY.md
§5.5): the 1 Hz PrintState dashboard (ekf_algorithm.hpp:211-260), the
Float32 plot topics (ekf_localization.cpp:613-640), and the pose/covariance
outputs become a text dashboard, a metrics dict, and file exporters.
"""

from __future__ import annotations

import json
import math
from typing import Dict

import numpy as np

from ..ekf import EkfState
from ..ekf.state import S_PITCH, S_ROLL, S_X, S_Y, S_YAW, S_Z


def state_dashboard(state: EkfState, cfg=None) -> str:
    """PrintState equivalent (ekf_algorithm.hpp:211-260)."""
    P = np.asarray(state.P)
    r2d = 180.0 / math.pi
    lines = ["-" * 40]
    if cfg is not None:
        gps = {0: "NavSatFix", 1: "BESTPOS", 2: "Odometry"}.get(int(cfg.gps_type), "?")
        lines.append(
            f"GPS: {gps if cfg.use_gps else 'X'}, "
            f"CAN: {'O' if cfg.use_can else 'X'}, "
            f"PCM: {'O' if cfg.use_pcm_matching else 'X'}"
        )
    init = "Init" if bool(state.state_initialized) else "Not Initialized!"
    stab = "Stabilized" if bool(state.state_stabilized) else "Unstabilized!"
    lines.append(f"State {init}, State {stab}")
    lines.append(
        "State Std  "
        f"X: {math.sqrt(max(P[S_X, S_X], 0)):.3f} "
        f"Y: {math.sqrt(max(P[S_Y, S_Y], 0)):.3f} "
        f"Z: {math.sqrt(max(P[S_Z, S_Z], 0)):.3f} m"
    )
    lines.append(
        "           "
        f"Roll: {math.sqrt(max(P[S_ROLL, S_ROLL], 0)) * r2d:.3f} "
        f"Pitch: {math.sqrt(max(P[S_PITCH, S_PITCH], 0)) * r2d:.3f} "
        f"Yaw: {math.sqrt(max(P[S_YAW, S_YAW], 0)) * r2d:.3f} deg"
    )
    if bool(state.pcm_init_on_going):
        lines.append(f"PCM warm-up: {int(state.pcm_update_count)} updates")
    lines.append("-" * 40)
    return "\n".join(lines)


def scan_metrics(out: Dict) -> Dict[str, float]:
    """Per-scan diagnostics dict (the Float32 plot-topic analog)."""
    pose = np.asarray(out["icp_pose"])
    return {
        "scan_end": float(out["scan_end"]),
        "x": float(pose[0, 3]),
        "y": float(pose[1, 3]),
        "z": float(pose[2, 3]),
        "applied": bool(out["applied"]),
        "icp_success": bool(out["icp_success"]),
        "deskew_ok": bool(out["deskew_ok"]),
        "pose_sync_ok": bool(out["pose_sync_ok"]),
        "fitness": float(out["fitness"]),
        "overlap": float(out["overlap"]),
        "iterations": int(out["iterations"]),
    }


def export_trajectory_tum(path: str, t, pos, quat_wxyz) -> None:
    """TUM trajectory format (t x y z qx qy qz qw) for evo/rpg evaluation."""
    with open(path, "w") as f:
        for i in range(len(t)):
            q = quat_wxyz[i]
            f.write(
                f"{t[i]:.6f} {pos[i][0]:.6f} {pos[i][1]:.6f} {pos[i][2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def export_metrics_jsonl(path: str, scans) -> None:
    with open(path, "w") as f:
        for s in scans:
            f.write(json.dumps(scan_metrics(s)) + "\n")


def export_cloud_ply(path: str, points: np.ndarray) -> None:
    """Minimal ASCII PLY export (the undistorted/aligned-cloud topics)."""
    pts = np.asarray(points)
    pts = pts[np.isfinite(pts).all(axis=1)]
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in pts:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
