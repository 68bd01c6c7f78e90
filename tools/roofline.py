"""Measured HBM/VPU roofline for the fused frame (VERDICT r3 weak #7).

The bench reports MFU against the v5e bf16 MXU peak (197 TFLOP/s) and the
notes assert the workload's ceiling is HBM/VPU, not MXU. This quantifies
that assertion with on-chip measurements instead of spec sheets:

1. HBM bandwidth: a resident 256 MB f32 buffer updated in place
   (``x*a+b``) inside a fori_loop — 2 bytes moved per element-op per pass
   (read + write), amortized over many passes.
2. VPU f32 throughput: a long FMA chain on a VMEM-resident [2048,128]
   block inside a fori_loop — flops = 2 * chain * size * iters; traffic is
   negligible, so this isolates the vector ALUs.
3. An analytic byte/flop count of the fused frame at bench shapes (same
   constants as bench.py's FLOP model, plus a byte model of what actually
   re-reads HBM per GN iteration: the halo coordinate blocks; the [QB,MH]
   intermediates stay fused in VMEM).

Prints the per-frame HBM-bound and VPU-bound lower-bound times next to the
measured frame time, i.e. how far the pipeline sits from ITS OWN roofline
(not the MXU's).

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

RTT = 0.035


def _time(fn, *args):
    """Best-of-3 wall time of fn(*args) with host readback, RTT-corrected."""
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))  # compile + settle
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out.ravel()[:1]))
        best = min(best, max(time.time() - t0 - RTT, 1e-9))
    return best


def measure_hbm_gbps(mb=256, passes=40):
    n = mb * (1 << 20) // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(x):
        def body(_, x):
            return x * 1.0000001 + 1e-7
        return jax.lax.fori_loop(0, passes, body, x)

    dt = _time(run, x)
    gb = passes * 2 * n * 4 / 1e9  # read + write per pass
    return gb / dt


def measure_vpu_gflops(chain=256, iters=400):
    x = jnp.ones((2048, 128), jnp.float32)
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-9)

    @jax.jit
    def run(x):
        def body(_, x):
            for _ in range(chain):
                x = x * a + b
            return x
        return jax.lax.fori_loop(0, iters, body, x)

    dt = _time(run, x)
    flops = 2 * chain * iters * x.size
    return flops / dt / 1e9


def frame_model(pipe, outs, batches):
    """Per-frame HBM bytes and VPU flops at the bench shapes (see
    bench.bench_tpu for the flop constants)."""
    n = int(np.asarray(outs["applied"]).shape[0])
    iters = int(np.asarray(outs["iterations"]).sum()) / n
    tb = pipe.static.icp_static.tile_budget
    s, qb = tb.max_slots, tb.qb
    mhp = int(pipe.map.halo_points.shape[1])
    dsp = pipe.static.ds_points
    n_imu = int(batches["imu_t"].shape[1])
    n_raw = int(batches["scan_points"].shape[2])

    flops = (
        iters * (s * qb * mhp * 16 + dsp * 400)
        + n_imu * 81_000
        + n_raw * 80
    )
    # HBM re-reads per frame: halo coord blocks per GN iteration (too big
    # for VMEM residence across iterations), raw scan points twice (gate +
    # deskew read, downsample read) + sort traffic ~ 4 passes of 8 lanes,
    # slot scatter write, per-iteration query/source slot buffers.
    halo = s * mhp * 3 * 4
    bytes_ = (
        iters * (halo + 2 * s * qb * 3 * 4)
        + n_raw * (4 * 4 + 3 * 4)            # gate+normalize+deskew pass
        + 4 * n_raw * 8 * 4                  # multi-operand sort passes
        + s * qb * 3 * 4                     # slot scatter
        + n_imu * 27 * 27 * 4 * 2            # P in/out per predict
    )
    return flops, bytes_, iters


def main():
    print("measuring HBM bandwidth...", flush=True)
    hbm = measure_hbm_gbps()
    print(f"  achievable HBM: {hbm:.0f} GB/s", flush=True)
    print("measuring VPU f32 throughput...", flush=True)
    vpu = measure_vpu_gflops()
    print(f"  achievable VPU: {vpu / 1e3:.2f} TFLOP/s (f32 fused a*x+b)",
          flush=True)

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

    flops, bytes_, iters = frame_model(pipe, outs, batches)
    t_vpu = flops / (vpu * 1e9) * 1e3
    t_hbm = bytes_ / (hbm * 1e9) * 1e3
    bound = max(t_vpu, t_hbm)
    print(f"\nframe model @ bench shapes ({iters:.2f} GN iters/frame):")
    print(f"  VPU flops/frame {flops / 1e6:.1f} MF -> {t_vpu:.3f} ms at "
          f"measured VPU peak")
    print(f"  HBM bytes/frame {bytes_ / 1e6:.1f} MB -> {t_hbm:.3f} ms at "
          f"measured BW")
    print(f"  roofline lower bound: {bound:.3f} ms/frame "
          f"({'VPU' if t_vpu > t_hbm else 'HBM'}-bound)")
    print(f"  measured:             {ms_frame:.3f} ms/frame "
          f"({ms_frame / bound:.1f}x above roofline; gap = sequential "
          f"dependency chain + dispatch, see BENCH_NOTES floor table)")


if __name__ == "__main__":
    main()
