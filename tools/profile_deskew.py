"""A/B the per-point deskew rotation interpolation on the real chip.

Compares the shipped interval-weight form of ``_find_rotation_batch``
(one [N,W] clipped-ratio plane + one [N,W]x[W,3] matmul) against the
round-2 one-hot-pair selection (searchsorted + two one-hot payload matmuls,
three HBM passes over the [N,W] plane) at fused-pipeline shapes, and
cross-checks them numerically. Amortized over an in-device fori_loop per
the relay timing rules (CLAUDE.md: block_until_ready is a no-op on axon).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_deskew.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from elimaloc_tpu import deskew as dk  # noqa: E402

N, W = 26624, 64     # bench shapes: 131072/5 index-sampled points, W=64 window
REPS = 300
RTT = 0.035


def old_find_rotation(info, point_times):
    """Round-2 form (kept verbatim for the A/B): searchsorted front/back pair
    + two one-hot payload matmuls (FindRotation, pcm_matching.cpp:731-762)."""
    t_adj = jnp.where(
        info.imu_included,
        info.imu_time,
        jnp.where(info.imu_time < info.scan_cur, -jnp.inf, jnp.inf),
    )
    front = jnp.searchsorted(t_adj, point_times, side="right")
    front = jnp.clip(front, info.first_idx, info.last_idx)
    back = jnp.maximum(front - 1, info.first_idx)
    m = info.imu_time.shape[0]
    iota = jnp.arange(m, dtype=front.dtype)[None, :]
    oh_f = (iota == front[:, None]).astype(info.imu_rot.dtype)
    oh_b = (iota == back[:, None]).astype(info.imu_rot.dtype)
    hi = jax.lax.Precision.HIGHEST
    payload = jnp.concatenate([info.imu_time[:, None], info.imu_rot], axis=1)
    sel_f = jnp.matmul(oh_f, payload, precision=hi)
    sel_b = jnp.matmul(oh_b, payload, precision=hi)
    t_f, rot_f = sel_f[:, 0], sel_f[:, 1:4]
    t_b, rot_b = sel_b[:, 0], sel_b[:, 1:4]
    beyond = point_times > t_f
    at_first = front == info.first_idx
    denom = jnp.where(t_f == t_b, 1.0, t_f - t_b)
    ratio = ((point_times - t_b) / denom)[:, None]
    interp = rot_f * ratio + rot_b * (1.0 - ratio)
    return jnp.where((beyond | at_first)[:, None], rot_f, interp)


def make_info(seed=0, t0=10.0, t1=10.1):
    rng = np.random.default_rng(seed)
    imu_t = np.sort(rng.uniform(t0 - 0.02, t1 + 0.02, W))
    inc = (imu_t >= t0 - 0.01) & (imu_t <= t1 + 0.01)
    first = int(np.argmax(inc))
    last = W - 1 - int(np.argmax(inc[::-1]))
    rot = np.cumsum(rng.normal(0, 1e-3, (W, 3)), 0)
    rot -= rot[first]
    rot[~inc] = 0.0
    info = dk.DeskewInfo(
        imu_time=jnp.asarray(imu_t, jnp.float32),
        imu_rot=jnp.asarray(rot, jnp.float32),
        imu_included=jnp.asarray(inc),
        first_idx=jnp.asarray(first, jnp.int32),
        last_idx=jnp.asarray(last, jnp.int32),
        odom_incre=jnp.zeros(3, jnp.float32),
        scan_cur=jnp.asarray(t0, jnp.float32),
        scan_end=jnp.asarray(t1, jnp.float32),
        imu_available=jnp.asarray(True),
        odom_available=jnp.asarray(True),
        imu_covers_start=jnp.asarray(True),
    )
    pt = jnp.asarray(rng.uniform(t0 - 0.005, t1 + 0.005, N), jnp.float32)
    return info, pt


def amortized(fn):
    @jax.jit
    def run(info, pt):
        def body(i, acc):
            r = fn(info, pt + i.astype(pt.dtype) * 1e-12)
            return acc + jnp.sum(r)
        return jax.lax.fori_loop(0, REPS, body, jnp.asarray(0.0, jnp.float32))
    return run


def main():
    info, pt = make_info()
    for name, fn in [("new interval-weight", dk._find_rotation_batch),
                     ("old one-hot pair   ", old_find_rotation)]:
        run = amortized(fn)
        float(run(info, pt))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            float(run(info, pt))  # host readback forces completion
            best = min(best, time.perf_counter() - t - RTT)
        print(f"{name}: {1e3 * best / REPS:.4f} ms/call")

    a = np.asarray(dk._find_rotation_batch(info, pt))
    b = np.asarray(old_find_rotation(info, pt))
    print("max |new - old| =", float(np.abs(a - b).max()))


if __name__ == "__main__":
    main()
