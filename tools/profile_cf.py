"""Complementary-filter cost breakdown (profile_imu: CF = 0.70 ms/frame).

Times per-sample CF variants amortized over an in-device fori_loop:
  a. current _complementary_filter
  b. measurement update with explicit 2x2 inverse instead of linalg.solve
  c. CF body without the P/state update (scalar prologue only)
  d. bare _ekf_measurement_update (2-dim)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_cf.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from elimaloc_tpu.config import ElimalocConfig  # noqa: E402
from elimaloc_tpu.ekf import ImuMeas, make_params  # noqa: E402
from elimaloc_tpu.ekf.filter import (  # noqa: E402
    EkfFlags, S_PITCH, S_ROLL, _complementary_filter,
    _ekf_measurement_update, init_state,
)
from elimaloc_tpu.ops import lie  # noqa: E402

RTT = 0.035
R = 200


def timed(fn, *args, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, max(time.time() - t0 - RTT, 0.0))
    print(f"{label:44s} {best / R * 1e6:8.2f} us/sample", flush=True)


def main():
    cfg = ElimalocConfig()
    params = make_params(cfg.ekf)
    flags = EkfFlags.from_config(cfg.ekf)
    st = init_state(params)
    st = st.replace(state_initialized=jnp.asarray(True),
                    cf_initialized=jnp.asarray(True),
                    cf_prev_time=jnp.asarray(-0.01, jnp.float32))
    imu = ImuMeas(timestamp=jnp.asarray(0.0, jnp.float32),
                  acc=jnp.asarray([0.1, 0.0, 9.81], jnp.float32),
                  gyro=jnp.asarray([0.0, 0.0, 0.02], jnp.float32))

    def loop(step):
        def g(s):
            def body(i, ss):
                m = ImuMeas(timestamp=imu.timestamp + i * 0.01,
                            acc=imu.acc, gyro=imu.gyro)
                return step(ss, m)
            return jax.lax.fori_loop(0, R, body, s)
        return jax.jit(g)

    timed(loop(lambda s, m: _complementary_filter(s, m, params, flags)),
          st, label="a current _complementary_filter")

    def upd2_explicit(state, idx, Y, Rm):
        P = state.P
        idx_a = jnp.asarray(idx)
        Pi = P[idx_a, :]
        S = Pi[:, idx_a] + Rm
        det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
        Sinv = jnp.array([[S[1, 1], -S[0, 1]], [-S[1, 0], S[0, 0]]]) / det
        K = jnp.matmul(P[:, idx_a], Sinv, precision=lie._HI)
        su = jnp.matmul(K, Y, precision=lie._HI)
        P_new = P - jnp.matmul(K, Pi, precision=lie._HI)
        rot = lie.quat_normalize(
            lie.quat_mul(state.rot, lie.quat_from_axis_angle(su[3:6])))
        imu_rot = lie.quat_normalize(
            lie.quat_mul(state.imu_rot, lie.quat_from_axis_angle(su[24:27])))
        return state.replace(
            pos=state.pos + su[0:3], vel=state.vel + su[6:9],
            gyro=state.gyro + su[9:12], acc=state.acc + su[12:15],
            bg=state.bg + su[15:18], ba=state.ba + su[18:21],
            grav=state.grav + su[21:24], rot=rot, imu_rot=imu_rot, P=P_new)

    Y2 = jnp.asarray([0.001, -0.002], jnp.float32)
    R2 = jnp.eye(2, dtype=jnp.float32) * 1e-4

    timed(loop(lambda s, m: _ekf_measurement_update(
        s, (S_ROLL, S_PITCH), Y2 + 0 * m.timestamp, R2)),
          st, label="d bare update (linalg.solve)")
    timed(loop(lambda s, m: upd2_explicit(
        s, (S_ROLL, S_PITCH), Y2 + 0 * m.timestamp, R2)),
          st, label="b bare update (explicit 2x2 inverse)")

    def cf_prologue(s, m):
        acc_meas = m.acc - s.ba
        vel_local = lie.quat_rotate(lie.quat_conj(s.rot), s.vel)
        rpy = lie.rot_to_euler(lie.quat_to_rot(s.rot))
        z = jnp.stack([jnp.arctan2(acc_meas[1], acc_meas[2]),
                       -jnp.arcsin(jnp.clip(acc_meas[0] / 9.81, -1, 1))])
        innov = lie.norm_angle_rad(z - rpy[:2])
        return s.replace(cf_prev_vel_local_x=vel_local[0] + innov[0],
                         cf_prev_time=m.timestamp)

    timed(loop(cf_prologue), st, label="c scalar prologue only")


if __name__ == "__main__":
    main()
