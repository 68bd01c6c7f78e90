"""NumPy oracle: a direct transliteration of the reference's cited equations.

The reference ships no tests (SURVEY.md §4), so golden values come from this
tiny, obviously-correct NumPy rendering of the formulas cited from
localization_functions.hpp / ekf_algorithm.cpp / registration.cpp /
voxel_hash_map.cpp. Everything here is float64 and scalar-looped — clarity
over speed. It doubles as the single-core CPU baseline for BENCH comparisons.
"""

from __future__ import annotations

import math

import numpy as np

D2R = math.pi / 180.0

# --------------------------------------------------------------------------- #
# Lie / Euler (localization_functions.hpp:248-483)
# --------------------------------------------------------------------------- #

def skew(v):
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]], dtype=np.float64
    )


def so3_exp(omega):
    theta = np.linalg.norm(omega)
    if theta < 1e-5:
        return np.eye(3)
    axis = omega / theta
    K = skew(axis)
    return np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)


def so3_log(R):
    cos_theta = np.clip((np.trace(R) - 1) / 2.0, -1.0, 1.0)
    theta = math.acos(cos_theta)
    if abs(theta) < 1e-5:
        return np.zeros(3)
    log_m = (R - R.T) / (2.0 * math.sin(theta))
    return theta * np.array([log_m[2, 1], log_m[0, 2], log_m[1, 0]])


def partial_derivative_rot_wrt_gyro(gyro, dt):
    """hpp:466-483 — reference formula verbatim (note: uses the normalized K)."""
    omega = np.asarray(gyro) * dt
    theta = np.linalg.norm(omega)
    if theta < 1e-5:
        return np.zeros((3, 3))
    axis = omega / theta
    K = skew(axis)
    return dt * (
        np.eye(3)
        + (1 - math.cos(theta)) / theta**2 * K
        + (theta - math.sin(theta)) / theta**3 * (K @ K)
    )


def rot_to_euler(R):
    """hpp:312-333 with the gimbal-lock branch and fmod renormalization."""
    if abs(R[2, 0]) > 0.998:
        yaw = math.atan2(-R[1, 2], R[1, 1])
        pitch = math.pi / 2 * (1 if R[2, 0] >= 0 else -1)
        roll = 0.0
    else:
        pitch = math.asin(-R[2, 0])
        cp = math.cos(pitch)
        roll = math.atan2(R[2, 1] / cp, R[2, 2] / cp)
        yaw = math.atan2(R[1, 0] / cp, R[0, 0] / cp)
    out = np.array([roll, pitch, yaw])
    return np.fmod(out + math.pi, 2 * math.pi) - math.pi


def euler_to_rot(rpy):
    r, p, y = rpy
    Rx = np.array(
        [[1, 0, 0], [0, math.cos(r), -math.sin(r)], [0, math.sin(r), math.cos(r)]]
    )
    Ry = np.array(
        [[math.cos(p), 0, math.sin(p)], [0, 1, 0], [-math.sin(p), 0, math.cos(p)]]
    )
    Rz = np.array(
        [[math.cos(y), -math.sin(y), 0], [math.sin(y), math.cos(y), 0], [0, 0, 1]]
    )
    return Rz @ Ry @ Rx


def norm_angle_rad(a):
    while a > math.pi:
        a -= 2 * math.pi
    while a < -math.pi:
        a += 2 * math.pi
    return a


def euler_residual(R_state, R_meas):
    """hpp:355-370."""
    s = rot_to_euler(R_state)
    m = rot_to_euler(R_meas)
    return np.array([norm_angle_rad(m[i] - s[i]) for i in range(3)])


def global_to_local_velocity(v, rpy):
    """hpp:491-513 (R^T v spelled out)."""
    return euler_to_rot(rpy).T @ np.asarray(v)


# --------------------------------------------------------------------------- #
# EKF (ekf_algorithm.cpp) — state as dict with rot/imu_rot as 3x3 matrices
# --------------------------------------------------------------------------- #

STATE_ORDER = 27


def ekf_init_np(params):
    P = np.eye(STATE_ORDER) * 100.0
    for i in range(15, 18):
        P[i, i] = params["imu_bias_cov_gyro"]
    for i in range(18, 24):
        P[i, i] = params["imu_bias_cov_acc"]
    for i in range(24, 27):
        P[i, i] = params["imu_bias_cov_gyro"]
    return {
        "pos": np.array(params.get("init_pos", np.zeros(3)), dtype=np.float64),
        "rot": euler_to_rot(params.get("init_rpy", np.zeros(3))),
        "vel": np.zeros(3),
        "gyro": np.zeros(3),
        "acc": np.zeros(3),
        "bg": np.zeros(3),
        "ba": np.zeros(3),
        "grav": np.array([0.0, 0.0, params["gravity"]]),
        "imu_rot": np.eye(3),
        "P": P,
    }


def ekf_predict_imu_np(state, acc, gyro, dt, params, estimate_gravity=True):
    """cpp:228-300 — nominal propagation + P = F P F^T + Q."""
    s = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in state.items()}
    G_R_I = state["rot"]
    corrected_gyro = gyro - state["bg"]
    delta_rot = so3_exp(corrected_gyro * dt)
    s["rot"] = state["rot"] @ delta_rot
    corrected_accel = acc - state["ba"]
    accel_global = G_R_I @ corrected_accel - state["grav"]
    s["pos"] = state["pos"] + state["vel"] * dt + 0.5 * accel_global * dt * dt
    s["vel"] = state["vel"] + accel_global * dt
    s["gyro"] = corrected_gyro
    s["acc"] = accel_global

    dt2 = dt * dt
    Q = np.zeros((27, 27))
    Q[0:3, 0:3] = np.eye(3) * params["state_std_pos_m"] ** 2 * dt2
    Q[3:6, 3:6] = np.eye(3) * (params["state_std_rot_deg"] * D2R) ** 2 * dt2
    Q[6:9, 6:9] = np.eye(3) * params["state_std_vel_mps"] ** 2 * dt2
    Q[9:12, 9:12] = np.eye(3) * (params["imu_std_gyro_dps"] * D2R) ** 2 * dt2
    Q[12:15, 12:15] = np.eye(3) * params["imu_std_acc_mps"] ** 2 * dt2
    Q[15:18, 15:18] = np.eye(3) * params["imu_bias_cov_gyro"] ** 2 * dt2
    Q[18:21, 18:21] = np.eye(3) * params["imu_bias_cov_acc"] ** 2 * dt2
    Q[21:24, 21:24] = np.eye(3) * params["imu_bias_cov_acc"] ** 2 * dt2
    Q[24:27, 24:27] = np.eye(3) * (params["state_std_rot_deg"] * D2R) ** 2 * dt2

    F = np.eye(27)
    F[0:3, 6:9] = np.eye(3) * dt
    F[0:3, 18:21] = -0.5 * G_R_I * dt * dt
    F[3:6, 15:18] = -partial_derivative_rot_wrt_gyro(corrected_gyro, dt)
    F[6:9, 18:21] = -G_R_I * dt
    F[9:12, 15:18] = -np.eye(3)
    F[12:15, 18:21] = -G_R_I
    if estimate_gravity:
        F[2, 23] = -0.5 * dt * dt
        F[8, 23] = -dt
        F[14, 23] = -1.0
    s["P"] = F @ state["P"] @ F.T + Q
    return s


def _update_ekf_state_np(s, K, Y, H):
    """ekf_algorithm.hpp:116-145."""
    su = K @ Y
    s["pos"] = s["pos"] + su[0:3]
    s["vel"] = s["vel"] + su[6:9]
    s["gyro"] = s["gyro"] + su[9:12]
    s["acc"] = s["acc"] + su[12:15]
    s["bg"] = s["bg"] + su[15:18]
    s["ba"] = s["ba"] + su[18:21]
    s["grav"] = s["grav"] + su[21:24]
    s["rot"] = s["rot"] @ so3_exp(su[3:6])
    s["imu_rot"] = s["imu_rot"] @ so3_exp(su[24:27])
    s["P"] = s["P"] - K @ H @ s["P"]
    return s


def ekf_update_gnss_np(state, pos, R_meas_rot, pos_cov, rot_cov, params,
                       source="PCM", yaw_initialized=True):
    """cpp:366-432 (regular path; PCM_INIT reset handled by caller)."""
    s = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in state.items()}
    H = np.zeros((6, 27))
    H[0:3, 0:3] = np.eye(3)
    H[3:6, 3:6] = np.eye(3)
    R = np.zeros((6, 6))
    R[0:3, 0:3] = pos_cov
    R[3:6, 3:6] = rot_cov
    if source in ("NOVATEL", "BESTPOS", "NAVSATFIX"):
        R[0, 0] += params["gnss_min_cov_x_m"]
        R[1, 1] += params["gnss_min_cov_y_m"]
        R[2, 2] += params["gnss_min_cov_z_m"]
        R[3, 3] += params["gnss_min_cov_roll_deg"] * D2R
        R[4, 4] += params["gnss_min_cov_pitch_deg"] * D2R
        R[5, 5] += params["gnss_min_cov_yaw_deg"] * D2R
    P = s["P"]
    Y = np.zeros(6)
    Y[0:3] = pos - s["pos"]
    Y[3:6] = euler_residual(s["rot"], R_meas_rot)
    if source in ("NAVSATFIX", "BESTPOS"):
        if not yaw_initialized:
            R[0, 0] += 3.0
            R[1, 1] += 3.0
        H3 = H[0:3, :]
        S3 = H3 @ P @ H3.T + R[0:3, 0:3]
        K3 = P @ H3.T @ np.linalg.inv(S3)
        return _update_ekf_state_np(s, K3, Y[0:3], H3)
    S = H @ P @ H.T + R
    K = P @ H.T @ np.linalg.inv(S)
    return _update_ekf_state_np(s, K, Y, H)


def ekf_update_can_np(state, can_vel, can_gyro_z, params, yaw_rate_bias=0.0):
    """cpp:434-506 (without the dt gate / ZuptCan, handled by caller)."""
    s = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in state.items()}
    unbiased_vel = can_vel.copy()
    unbiased_vel[0] *= params["can_vel_scale"]
    unbiased_gyro_z = can_gyro_z - yaw_rate_bias
    Rm = s["rot"]
    can_vel_global = Rm @ unbiased_vel
    H = np.zeros((4, 27))
    H[0, 6] = H[1, 7] = H[2, 8] = H[3, 11] = 1.0
    Z = np.array([*can_vel_global, unbiased_gyro_z])
    Z_state = np.array([*s["vel"], s["gyro"][2]])
    R_local = np.diag(
        [
            params["can_unc_vel"] ** 2,
            (2 * params["can_unc_vel"]) ** 2,
            (2 * params["can_unc_vel"]) ** 2,
        ]
    )
    R = np.zeros((4, 4))
    R[0:3, 0:3] = Rm @ R_local @ Rm.T
    R[3, 3] = (params["can_unc_yaw_rate_deg"] * D2R) ** 2
    P = s["P"]
    S = H @ P @ H.T + R
    K = P @ H.T @ np.linalg.inv(S)
    return _update_ekf_state_np(s, K, Z - Z_state, H)


# --------------------------------------------------------------------------- #
# ICP single Gauss-Newton step oracles (registration.cpp:15-225)
# --------------------------------------------------------------------------- #

def align_clouds_local_np(source_global, source_local, target_global,
                          last_icp_pose, trans_th, lm_lambda):
    """AlignCloudsLocal (registration.cpp:15-66). source_local = the point's
    ``local`` field (sensor frame); target in global; returns (T, fitness)."""
    JTJ = np.zeros((6, 6))
    JTr = np.zeros(6)
    inv_pose = np.linalg.inv(last_icp_pose)
    residual_sum = 0.0
    n = len(source_global)
    for i in range(n):
        th = np.append(target_global[i], 1.0)
        target_local = (inv_pose @ th)[:3]
        residual_local = target_local - source_local[i]
        J = np.zeros((3, 6))
        J[:, 0:3] = np.eye(3)
        J[:, 3:6] = -skew(source_local[i])
        w = trans_th**2 / (trans_th + residual_local @ residual_local) ** 2
        JTJ += w * J.T @ J
        JTr += w * J.T @ residual_local
        residual_sum += np.linalg.norm(residual_local)
    fitness = residual_sum / n
    x = np.linalg.solve(JTJ + lm_lambda * np.diag(np.diag(JTJ)), JTr)
    T = np.eye(4)
    T[:3, :3] = so3_exp(x[3:6])
    T[:3, 3] = x[0:3]
    return T, fitness


def align_clouds_voxel_cov_np(source_local, target_means, target_covs,
                              last_icp_pose, trans_th, lm_lambda):
    """AlignCloudsLocalVoxelCov (registration.cpp:154-225); returns (T, fitness)."""
    JTJ = np.zeros((6, 6))
    JTr = np.zeros(6)
    inv_pose = np.linalg.inv(last_icp_pose)
    rot_inv = last_icp_pose[:3, :3].T
    residual_sum = 0.0
    n = len(source_local)
    for i in range(n):
        th = np.append(target_means[i], 1.0)
        target_local = (inv_pose @ th)[:3]
        residual_local = target_local - source_local[i]
        RCR = rot_inv @ target_covs[i] @ rot_inv.T
        maha = np.linalg.inv(RCR)
        J = np.zeros((3, 6))
        J[:, 0:3] = np.eye(3)
        J[:, 3:6] = -skew(source_local[i])
        w = trans_th**2 / (trans_th + residual_local @ residual_local) ** 2
        if w < 0.01:
            continue
        JTJ += w * J.T @ maha @ J
        JTr += w * J.T @ maha @ residual_local
        residual_sum += np.linalg.norm(residual_local)
    fitness = residual_sum / n
    x = np.linalg.solve(JTJ + lm_lambda * np.diag(np.diag(JTJ)), JTr)
    T = np.eye(4)
    T[:3, :3] = so3_exp(x[3:6])
    T[:3, 3] = x[0:3]
    return T, fitness


def align_clouds_point_cov_np(source_local, target_means, target_covs,
                              last_icp_pose, trans_th, lm_lambda):
    """AlignCloudsLocalPointCov (registration.cpp:68-152).
    Returns (T, fitness, local_cov)."""
    JTJ = np.zeros((6, 6))
    JTr = np.zeros(6)
    inv_pose = np.linalg.inv(last_icp_pose)
    rot_inv = last_icp_pose[:3, :3].T
    residual_sum = 0.0
    n = len(source_local)
    for i in range(n):
        evals, evecs = np.linalg.eigh(target_covs[i])
        normal_global = evecs[:, 0]
        normal_local = rot_inv @ normal_global
        normal_local = normal_local / np.linalg.norm(normal_local)
        th = np.append(target_means[i], 1.0)
        target_local = (inv_pose @ th)[:3]
        residual_local = target_local - source_local[i]
        RCR = rot_inv @ target_covs[i] @ rot_inv.T
        maha = np.linalg.inv(RCR)
        J = np.zeros((3, 6))
        J[:, 0:3] = np.eye(3)
        J[:, 3:6] = -skew(source_local[i])
        w = trans_th**2 / (trans_th + residual_local @ residual_local) ** 2 * 0.8 + 0.2
        JTJ += w * J.T @ maha @ J
        JTr += w * J.T @ maha @ residual_local
        residual_sum += abs(residual_local @ normal_local)
    fitness = residual_sum / n
    reg = JTJ + lm_lambda * np.diag(np.diag(JTJ))
    x = np.linalg.solve(reg, JTr)
    local_cov = np.linalg.inv(reg)
    T = np.eye(4)
    T[:3, :3] = so3_exp(x[3:6])
    T[:3, 3] = x[0:3]
    return T, fitness, local_cov


# --------------------------------------------------------------------------- #
# Voxel map oracles (voxel_hash_map.{hpp,cpp})
# --------------------------------------------------------------------------- #

def voxel_cov_np(points):
    """VoxelBlock::CalVoxelCov (voxel_hash_map.hpp:114-148)."""
    n = len(points)
    if n == 0:
        return np.eye(3), np.zeros(3)
    if n == 1:
        return np.eye(3), np.asarray(points[0], dtype=np.float64)
    pts = np.asarray(points, dtype=np.float64).T  # 3 x n
    mean = pts.mean(axis=1)
    centered = pts - mean[:, None]
    cov = centered @ centered.T / (n - 1)
    U, _, Vt = np.linalg.svd(cov)
    cov = U @ np.diag([1.0, 1.0, 1e-3]) @ Vt
    return cov, mean


def nearest_in_27_voxels_np(query, map_points, voxel_size):
    """GetCorrespondencePoints semantics (voxel_hash_map.cpp:31-88): nearest
    map point among those whose voxel is within the 3x3x3 neighborhood of the
    query's voxel. Brute force over all map points for the oracle."""
    qv = np.floor(np.asarray(query) / voxel_size).astype(int)
    best, best_d2 = None, np.inf
    for p in map_points:
        pv = np.floor(np.asarray(p) / voxel_size).astype(int)
        if np.all(np.abs(pv - qv) <= 1):
            d2 = np.sum((np.asarray(p) - query) ** 2)
            if d2 < best_d2:
                best, best_d2 = p, d2
    return best, best_d2
