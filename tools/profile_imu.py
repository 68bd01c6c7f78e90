"""Where the fused frame's 1.41 ms IMU sub-scan goes (profile_floor stage 0).

Times the 11-sample IMU sub-scan with pieces stubbed:
  a. full imu_step (predict + ego ring push + imu ring push)
  b. predict_imu only (no rings, no ego_state)
  c. predict + ego_state conversion (no ring writes)
  d. ring pushes only (no predict, constant ego fields)
  e. propagate only (predict_imu with CF compiled out)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_imu.py
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
from elimaloc_tpu.ekf import ImuMeas, ego_state, predict_imu  # noqa: E402
from elimaloc_tpu.ops.frames import imu_to_ego  # noqa: E402
from elimaloc_tpu.ops import lie  # noqa: E402
from elimaloc_tpu.pipeline import rings  # noqa: E402
from elimaloc_tpu.pipeline.runtime import (  # noqa: E402
    _select_state, build_fused_batches, imu_step,
)

RTT = 0.035


def main():
    pipe, log = bench.build_everything()
    st0 = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = jax.device_put(build_fused_batches(log, time_base=pipe.time_base))
    n = len(log.scan_t)
    pp, ps = pipe.params, pipe.static
    flags_nocf = dataclasses.replace(
        ps.ekf_flags, use_complementary_filter=False)

    def imu_scan(step):
        def frame(s, b):
            def body(ss, x):
                t, acc, gyro, v = x
                s2 = step(ss, t, acc, gyro)
                return _select_state(v, s2, ss), None
            s = jax.lax.scan(
                body, s,
                (b["imu_t"], b["imu_acc"], b["imu_gyro"], b["imu_valid"]),
                unroll=ps.sub_unroll)[0]
            return s, s.ekf.pos
        return jax.jit(lambda st, bt: jax.lax.scan(frame, st, bt))

    def a_full(s, t, acc, gyro):
        return imu_step(s, t, acc, gyro, pp, ps)

    def b_predict(s, t, acc_raw, gyro_raw):
        acc, gyro = imu_to_ego(acc_raw, gyro_raw, pp.ego_to_imu_rot,
                               pp.ego_to_imu_trans)
        ekf = predict_imu(s.ekf, ImuMeas(timestamp=t, acc=acc, gyro=gyro),
                          pp.ekf, ps.ekf_flags)
        return s.replace(ekf=ekf)

    def c_predict_es(s, t, acc_raw, gyro_raw):
        s = b_predict(s, t, acc_raw, gyro_raw)
        es = ego_state(s.ekf)
        # consume es without ring writes
        return s.replace(ekf=s.ekf.replace(
            prev_timestamp=s.ekf.prev_timestamp + 0.0 * es["vel_local"][0]))

    def d_rings(s, t, acc_raw, gyro_raw):
        gyro_pcm = jnp.matmul(pp.ego_to_imu_rot, gyro_raw, precision=lie._HI)
        acc_pcm = jnp.matmul(pp.ego_to_imu_rot, acc_raw, precision=lie._HI)
        ring = rings.push_ego(s.ego_ring, t, s.ekf.pos, s.ekf.vel,
                              s.ekf.vel, s.ekf.gyro)
        return s.replace(
            ego_ring=ring,
            imu_ring=rings.push_imu(s.imu_ring, t, gyro_pcm, acc_pcm))

    def e_prop_only(s, t, acc_raw, gyro_raw):
        acc, gyro = imu_to_ego(acc_raw, gyro_raw, pp.ego_to_imu_rot,
                               pp.ego_to_imu_trans)
        ekf = predict_imu(s.ekf, ImuMeas(timestamp=t, acc=acc, gyro=gyro),
                          pp.ekf, flags_nocf)
        return s.replace(ekf=ekf)

    for label, step in (("a full imu_step", a_full),
                        ("b predict only", b_predict),
                        ("c predict+ego_state", c_predict_es),
                        ("d rings only", d_rings),
                        ("e propagate only (no CF)", e_prop_only)):
        fn = imu_scan(step)
        o = fn(st0, batches)
        float(jnp.sum(o[1]))
        best = np.inf
        for _ in range(4):
            t0 = time.time()
            o = fn(st0, batches)
            float(jnp.sum(o[1]))
            best = min(best, max(time.time() - t0 - RTT, 1e-9))
        print(f"{label:28s} {best / n * 1e3:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
