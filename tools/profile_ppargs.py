"""A/B the params-as-call-time-argument refactor on the real chip.

Round 4 moved PipelineParams from partial-bound trace constants to a
call-time argument of the jitted steps (hot-reload without recompile,
runtime._build_jitted). This measures the fused-replay steady-state at the
official bench shapes — run it on the refactored tree and on the
pre-refactor tree (git stash) back-to-back under the same host conditions.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_ppargs.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")


def main():
    import jax
    import jax.numpy as jnp

    import bench

    pipe, log = bench.build_everything()
    state = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    batches = jax.device_put(
        build_fused_batches(log, time_base=pipe.time_base))
    _, outs = pipe._fused(state, batches, pipe.map)  # compile + run
    float(jnp.sum(outs["ego_pos"]))
    n = len(log.scan_t)
    best = np.inf
    for _ in range(5):
        st = pipe.reset()
        t0 = time.time()
        _, outs = pipe._fused(st, batches, pipe.map)
        float(jnp.sum(outs["ego_pos"]))
        best = min(best, max(time.time() - t0 - bench.RTT, 1e-9))
    print(f"fused steady-state: {n / best:.2f} scans/s "
          f"({best / n * 1e3:.3f} ms/frame, n={n})")


if __name__ == "__main__":
    main()
