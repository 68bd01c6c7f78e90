"""Measured HBM/VPU roofline model of the fused frame (VERDICT r3 weak #7,
recorded per-round via bench.py since r5).

The bench reports MFU against the v5e bf16 MXU peak (197 TFLOP/s) and the
notes assert the workload's ceiling is HBM/VPU, not MXU. These helpers
quantify that assertion with on-chip measurements instead of spec sheets:

- :func:`measure_hbm_gbps`: a resident 256 MB f32 buffer updated in place
  (``x*a+b``) inside a fori_loop — 2 bytes moved per element-op per pass
  (read + write), amortized over many passes.
- :func:`measure_vpu_gflops`: a long FMA chain on a VMEM-resident
  [2048,128] block inside a fori_loop — flops = 2 * chain * size * iters;
  traffic is negligible, so this isolates the vector ALUs.
- :func:`frame_model`: an analytic byte/flop count of the fused frame at
  bench shapes (same constants as bench.py's FLOP model, plus a byte model
  of what actually re-reads HBM per GN iteration: the halo coordinate
  blocks; the [QB,MH] intermediates stay fused in VMEM).

Together they give the per-frame HBM-bound and VPU-bound lower-bound times
to put next to the measured frame time: how far the pipeline sits from ITS
OWN roofline (not the MXU's). Reference frame being modeled:
voxel_hash_map.cpp:31-88 + registration.cpp:15-66 hot loops.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

RTT = 0.035  # axon relay round-trip (CLAUDE.md; block_until_ready is a no-op)


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
    bench.bench_tpu for the flop constants). Returns (flops, bytes, iters)
    where iters is the mean GN iterations per frame actually executed."""
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


def roofline_report(pipe, outs, batches, frame_ms):
    """Full roofline record for the bench JSON: measured ceilings + model
    bounds + the measured/bound fraction (1.0 = at the roofline)."""
    hbm = measure_hbm_gbps()
    vpu = measure_vpu_gflops()
    flops, bytes_, iters = frame_model(pipe, outs, batches)
    t_vpu_ms = flops / (vpu * 1e9) * 1e3
    t_hbm_ms = bytes_ / (hbm * 1e9) * 1e3
    bound_ms = max(t_vpu_ms, t_hbm_ms)
    return dict(
        hbm_gbps=round(hbm, 1),
        vpu_tflops=round(vpu / 1e3, 3),
        model_gn_iters_per_frame=round(iters, 2),
        vpu_bound_ms=round(t_vpu_ms, 3),
        hbm_bound_ms=round(t_hbm_ms, 3),
        bound_kind="VPU" if t_vpu_ms > t_hbm_ms else "HBM",
        measured_frame_ms=round(frame_ms, 3),
        # fraction of the frame's own roofline it achieves (bound/measured):
        # >=0.5 means the remaining gap is dependency-chain/dispatch, not
        # unexploited arithmetic or bandwidth
        roofline_frac=round(bound_ms / frame_ms, 3) if frame_ms else None,
    )
