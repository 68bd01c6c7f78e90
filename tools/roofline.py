"""Measured HBM/VPU roofline for the fused frame (VERDICT r3 weak #7).

Thin CLI over elimaloc_tpu.utils.roofline (the measurement + model code now
lives there so bench.py records a ``roofline`` block in every official
capture). Prints the per-frame HBM-bound and VPU-bound lower-bound times
next to the measured frame time, i.e. how far the pipeline sits from ITS
OWN roofline (not the MXU's).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/roofline.py
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
from elimaloc_tpu.utils.roofline import RTT, roofline_report  # noqa: E402


def main():
    print("building bench pipeline...", flush=True)
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    pipe, log = bench.build_everything()
    state = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=pipe.time_base)
    jax.block_until_ready(jax.tree_util.tree_leaves(batches))
    _, outs = pipe._fused(state, batches, pipe.map)
    float(jnp.sum(outs["ego_pos"]))
    n = len(log.scan_t)
    best = np.inf
    for _ in range(3):
        st2 = pipe.reset()
        t0 = time.time()
        _, outs = pipe._fused(st2, batches, pipe.map)
        float(jnp.sum(outs["ego_pos"]))
        best = min(best, max(time.time() - t0 - RTT, 1e-9))
    ms_frame = best / n * 1e3

    print("measuring HBM + VPU ceilings...", flush=True)
    r = roofline_report(pipe, outs, batches, ms_frame)
    print(f"\n  achievable HBM: {r['hbm_gbps']:.0f} GB/s")
    print(f"  achievable VPU: {r['vpu_tflops']:.2f} TFLOP/s (f32 fused a*x+b)")
    print(f"\nframe model @ bench shapes "
          f"({r['model_gn_iters_per_frame']:.2f} GN iters/frame):")
    print(f"  VPU bound {r['vpu_bound_ms']:.3f} ms | HBM bound "
          f"{r['hbm_bound_ms']:.3f} ms -> {r['bound_kind']}-bound")
    print(f"  measured: {r['measured_frame_ms']:.3f} ms/frame = "
          f"{r['roofline_frac'] * 100:.1f}% of its own roofline "
          f"(gap = sequential dependency chain + dispatch, see BENCH_NOTES "
          f"floor table)")


if __name__ == "__main__":
    main()
