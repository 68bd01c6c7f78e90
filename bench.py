#!/usr/bin/env python
"""Benchmark: full fused localization (deskew + ICP + EKF) scans/sec on TPU.

Headline metric (BASELINE.json): fused P2P scans/sec at 128k raw points per
scan. ``vs_baseline`` is measured against the native single-core C++ scan
step (native/src/scan_step.cpp — the same math over the same packed map
arrays, the honest stand-in for the reference's CPU pipeline normalized to
one core); the well-vectorized NumPy implementation is reported alongside.

Also recorded (VERDICT round-1 items 1/5): per-ICP-method fused throughput +
ATE on a smaller log, and the trajectory-parity ATE of the TPU pipeline vs
the float64 CPU-oracle pipeline (reference_cpu.CpuPipeline) on that same log.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time


def _wait_for_device(attempts: int = 5, probe_timeout_s: int = 300,
                     pause_s: int = 120) -> None:
    """Gate the bench on TPU availability. The shared axon relay flaps; a
    failed PJRT init poisons the process (no in-process retry), so probe
    device init in a THROWAWAY subprocess first and only fall through to the
    real imports once a probe succeeds. Must run BEFORE the elimaloc_tpu
    imports below — their module-level jnp constants initialize the backend,
    and a dead relay would hang this process right there. A dead relay
    either hangs the probe (killed at probe_timeout_s) or errors after its
    own long internal timeout; both count as one failed attempt. Exhausting
    every attempt raises — no JSON line is printed for a machine failure, a
    wrong number would be worse than none."""
    import subprocess

    if os.environ.get("BENCH_NO_DEVICE_GATE"):
        return
    probe = "import jax; print(jax.devices()[0])"
    last = None
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                return
            last = (r.stderr or "").strip().splitlines()[-1:]
        except subprocess.TimeoutExpired:
            last = [f"device init still hung after {probe_timeout_s}s"]
        print(
            f"bench: device probe {i + 1}/{attempts} failed"
            + (f" ({last[0]})" if last else ""),
            file=sys.stderr, flush=True,
        )
        if i + 1 < attempts:
            time.sleep(pause_s)
    raise RuntimeError(
        f"TPU device init failed {attempts} times — relay down? "
        + (last[0] if last else "")
    )


if __name__ == "__main__":
    _wait_for_device()

import numpy as np

import jax
import jax.numpy as jnp

from elimaloc_tpu.config import ElimalocConfig, IcpMethod
from elimaloc_tpu.map import TileQueryBudget
from elimaloc_tpu.map.builder import build_voxel_map
from elimaloc_tpu.pipeline import (
    LocalizationPipeline,
    ate_rmse,
    make_world,
    synthesize_log,
)
from elimaloc_tpu.reference_cpu import CpuPipeline, CpuVoxelGrid, cpu_scan_step

RAW_POINTS = int(os.environ.get("BENCH_RAW_POINTS", 131072))
INDEX_SAMPLING = 5          # reference: input_index_sampling (ini :88)
N_SCANS = int(os.environ.get("BENCH_SCANS", 40))
CPU_SCANS = int(os.environ.get("BENCH_CPU_SCANS", 3))
METHOD_SCANS = int(os.environ.get("BENCH_METHOD_SCANS", 15))
SKIP_METHODS = bool(int(os.environ.get("BENCH_SKIP_METHODS", "0")))
RTT = 0.035                 # axon relay round-trip, measured
# Repeat counts (recorded in the JSON so a reader can judge the spread):
HEADLINE_REPEATS = int(os.environ.get("BENCH_HEADLINE_REPEATS", 3))
METHOD_REPEATS = int(os.environ.get("BENCH_METHOD_REPEATS", 3))
LATENCY_FRAMES = int(os.environ.get("BENCH_LATENCY_FRAMES", 60))


def _cfg(method=IcpMethod.P2P):
    cfg = ElimalocConfig()
    cfg.pcm.icp_method = method
    cfg.pcm.lidar_time_delay = 0.0
    cfg.ekf.ekf_init_x_m = 60.0
    cfg.ekf.ekf_init_y_m = 0.0
    cfg.ekf.ekf_init_yaw_deg = 90.0
    cfg.calib.ego_to_lidar_trans = (0.0, 0.0, 0.0)
    cfg.calib.ego_to_lidar_rot_deg = (0.0, 0.0, 0.0)
    if method in (IcpMethod.VGICP, IcpMethod.AVGICP):
        # voxel-mean fitness floor (see tests/test_icp.py): the mean
        # |residual| to voxel MEANS is ~0.5 m by construction at 1 m voxels
        cfg.pcm.max_fitness_score = 2.0
    return cfg


def autosize_budgets(log, voxel_ds, tile_size, qb=32, headroom=0.15):
    """Static shape budgets sized FROM the log (host numpy pre-pass):
    ds_points covers the densest scan's occupied downsample voxels plus
    ``headroom``; max_slots covers that scan's occupied query tiles plus the
    per-tile chunking overhead (VERDICT r2 item 7: a 1.7%-margin budget is
    not a guard)."""
    max_kept = 0
    max_slots = 0
    for k in range(len(log.scan_t)):
        p = log.scan_points[k][log.scan_valid[k]]
        vox = np.unique(np.floor(p / voxel_ds).astype(np.int64), axis=0)
        kept = len(vox)
        # slots: one per (tile, qb-chunk); ds points land one-per-voxel
        tiles, cnt = np.unique(
            np.floor(vox[:, :2] * voxel_ds / tile_size).astype(np.int64),
            axis=0, return_counts=True,
        )
        slots = int(np.ceil(cnt / qb).sum())
        max_kept = max(max_kept, kept)
        max_slots = max(max_slots, slots)
    rup = lambda x, m: int(np.ceil(x / m) * m)
    return (
        rup(max_kept * (1 + headroom), 512),
        rup(max_slots * (1 + headroom), 8),
    )


def build_everything():
    world = make_world(seed=3, extent=120.0, n_ground=400_000, n_wall=200_000)
    log = synthesize_log(
        world,
        duration=(N_SCANS + 3) * 0.1,
        points_per_scan=RAW_POINTS,
        max_range=100.0,
        seed=4,
    )
    # Reference ingest: index subsampling 1/5 (pcm_matching.cpp:908-921)
    sl = slice(None, None, INDEX_SAMPLING)
    log.scan_points = np.ascontiguousarray(log.scan_points[:, sl])
    log.scan_times = np.ascontiguousarray(log.scan_times[:, sl])
    log.scan_valid = np.ascontiguousarray(log.scan_valid[:, sl])

    cfg = _cfg()
    ds_points, max_slots = autosize_budgets(
        log, float(cfg.pcm.input_voxel_ds_m), 4.0 * cfg.pcm.pcm_voxel_size,
        qb=16,
    )
    pipe = LocalizationPipeline(
        cfg, world,
        ds_points=ds_points,
        # qb=16 halo-block path: measured fastest at this scale with the
        # flat slot-layout GN tails (A/B: 116.5 vs 100.8 scans/s at qb=32;
        # tools/profile_sweep.py)
        tile_budget=TileQueryBudget(qb=16, max_slots=max_slots),
        ego_ring_size=512, imu_ring_size=256,
    )
    return pipe, log


def bench_tpu(pipe, log):
    """Steady-state fused throughput: host batch prep (log load + H2D) is
    timed separately — it happens once per log and overlaps with streaming
    in production, while the jitted replay is the recurring cost."""
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    state = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    tb = pipe.time_base
    t0 = time.time()
    batches = build_fused_batches(log, time_base=tb)
    jax.block_until_ready(jax.tree_util.tree_leaves(batches))
    host_prep = time.time() - t0
    _, outs = pipe._fused(state, batches, pipe.map)  # compile + run
    float(jnp.sum(outs["ego_pos"]))
    # best-of-N with the full run-time spread recorded: the shared relay/
    # host shows 1.5-2x run-to-run variance, and a single "best" number
    # cannot distinguish a real regression from one quiet run (VERDICT r4
    # missing #2) — the JSON now carries best AND median AND the raw spread
    runs = []
    for _ in range(HEADLINE_REPEATS):
        state2 = pipe.reset()
        pipe.time_base = tb
        t0 = time.time()
        state, outs = pipe._fused(state2, batches, pipe.map)
        float(jnp.sum(outs["ego_pos"]))
        runs.append(max(time.time() - t0 - RTT, 1e-9))
    dt = min(runs)
    dt_med = float(np.median(runs))
    outs["ego_t_abs"] = np.asarray(outs["ego_t"], np.float64) + tb
    n = len(log.scan_t)
    t_abs = np.asarray(outs["ego_t_abs"])
    pos = np.asarray(outs["ego_pos"])
    ate = ate_rmse(t_abs, pos, log.truth_t, log.truth_pos)
    tail = t_abs > log.scan_t[0] + 0.6 * (log.scan_t[-1] - log.scan_t[0])
    ate_tail = ate_rmse(t_abs[tail], pos[tail], log.truth_t, log.truth_pos)
    applied = float(np.asarray(outs["applied"]).mean())
    dropped = int(np.asarray(outs["slots_dropped"]).max())
    ds_kept = int(np.asarray(outs["ds_kept"]).max())
    # Saturation is REPORTED, not asserted (a seed change must not break the
    # one-JSON-line contract); budgets come from autosize_budgets with >=15%
    # headroom, so nonzero drops here mean that policy failed.
    if dropped:
        print(f"WARNING: tile-slot budget undersized: {dropped} dropped",
              file=sys.stderr)
    if ds_kept >= pipe.static.ds_points:
        print("WARNING: downsample budget saturated", file=sys.stderr)

    # Analytic FLOP model of the executed math (XLA's cost_analysis does not
    # descend into scan/while bodies on this backend). Constants documented
    # in BENCH_NOTES; MFU convention: fraction of the chip's bf16 MXU peak
    # (197 TFLOP/s on v5e).
    iters_total = int(np.asarray(outs["iterations"]).sum())
    s_slots = pipe.static.icp_static.tile_budget.max_slots
    qb = pipe.static.icp_static.tile_budget.qb
    mhp = int(pipe.map.halo_points.shape[1])
    n_imu = int(batches["imu_t"].shape[0] * batches["imu_t"].shape[1])
    n_raw = int(batches["scan_points"].shape[1])
    flops = (
        iters_total * (s_slots * qb * mhp * 16           # dense corr + select
                       + pipe.static.ds_points * 400)    # GN tail per row
        + n_imu * 81_000                                 # 27x27 F P F^T + Q
        + n * n_raw * 80                                 # deskew per point
    )
    tflops = flops / dt / 1e12
    mfu = tflops / 197.0

    return dict(
        scans_per_s=n / dt, scans_per_s_median=n / dt_med,
        run_times_s=[round(x, 4) for x in runs],
        ate=ate, ate_tail=ate_tail, applied=applied,
        ds_kept=ds_kept, host_prep=host_prep, dropped=dropped,
        ds_budget=pipe.static.ds_points,
        ds_headroom=round(1.0 - ds_kept / pipe.static.ds_points, 4),
        flops_per_scan=flops / n, achieved_tflops=round(tflops, 3),
        mfu_bf16_peak=round(mfu, 5),
    )


def bench_latency(pipe, log, n_frames=None):
    """Single-frame dispatch latency (the online serving metric): one
    fused_frame_at call + scalar readback per frame, relay round-trip
    subtracted (measured, not assumed).

    Tail forensics (VERDICT r4 #10): each frame is dispatched 3 times from
    the SAME input state (the step is a pure function, so the re-dispatches
    compute the identical frame) — the first timing is the honest host
    number (one shot, relay jitter included), the min-of-3 strips relay/host
    hiccups and is the device+dispatch floor. p95(host) - p95(best) is the
    relay tail; if the two agree, the tail is real device work. The log is
    cycled if shorter than ``n_frames`` (state advances each frame either
    way — frame k's program is index-fed, so wraparound stays in-bounds)."""
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    if n_frames is None:
        n_frames = LATENCY_FRAMES
    state = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=pipe.time_base)
    # measure the relay RTT with a trivial readback
    tiny = jnp.asarray(1.0)
    float(tiny + 0)
    rtts = []
    for _ in range(7):
        t0 = time.time()
        float(jnp.sum(batches["scan_t"]))
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    # warm up the frame program
    state, out = pipe._frame_at(state, batches, jnp.asarray(0, jnp.int32),
                                pipe.map)
    float(out["ego_t"])
    n_log = len(log.scan_t)
    host, best = [], []
    for i in range(n_frames):
        k = 1 + i % (n_log - 1)
        samples = []
        for _ in range(3):
            t0 = time.time()
            state2, out = pipe._frame_at(
                state, batches, jnp.asarray(k, jnp.int32), pipe.map
            )
            float(out["ego_t"])
            samples.append(max(time.time() - t0 - rtt, 0.0))
        host.append(samples[0])
        best.append(min(samples))
        state = state2
    host = np.asarray(host) * 1e3
    best = np.asarray(best) * 1e3
    pct = lambda a, q: float(np.percentile(a, q))
    return dict(
        p50_ms=pct(host, 50), p95_ms=pct(host, 95),
        device_p50_ms=pct(best, 50), device_p95_ms=pct(best, 95),
        frames=n_frames,
    )


def bench_streaming(pipe, log):
    """Frame-streamed online mode (run_frames): one dispatch per scan frame,
    single end-of-run readback. Batches are prebuilt (steady-state — host
    prep is per-log, reported as host_batch_prep_s)."""
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=pipe.time_base)
    pipe.run_frames(log, batches=batches)   # compile + run
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        pipe.run_frames(log, batches=batches)
        best = min(best, max(time.time() - t0 - RTT, 1e-9))
    return len(log.scan_t) / best


def bench_windowed(pipe, log):
    """Active-window streaming (run_frames + map_window_radius): the resident
    window re-crops with async prefetch as the vehicle arcs, so crop + H2D +
    adopt hiccups are folded into the measured throughput (round-2 VERDICT
    weak item 8: windowed throughput appeared in no bench; the city-scale
    RSS bound lives in tests/test_city_scale.py). The sensor gate is reduced
    to 40 m so a 48 m window both covers the full sensor range AND actually
    swaps over the ~34 m bench arc — a separate, labeled workload from the
    100 m-gate headline row. Reuses the already-packed tile map."""
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    cfg = _cfg()
    cfg.pcm.input_max_dist = 40.0
    wpipe = LocalizationPipeline(
        cfg, pipe._tiles_host_full,
        ds_points=pipe.static.ds_points,
        tile_budget=pipe.static.icp_static.tile_budget,
        ego_ring_size=512, imu_ring_size=256,
        map_window_radius=48.0,
    )
    wpipe.reset()
    wpipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=wpipe.time_base)
    # headline: CHUNKED windowed replay (run_fused routes windowed pipelines
    # through replay_fused_chunk — one dispatch + one pose readback per 8
    # frames, window swaps between chunks; round-3 VERDICT weak item 3: the
    # per-frame windowed loop ran 6x below plain streaming)
    state, outs = wpipe.run_frames(log, batches=batches, chunk=8)  # compile
    applied = float(np.asarray(outs["applied"]).mean())
    start_xy = np.array([cfg.ekf.ekf_init_x_m, cfg.ekf.ekf_init_y_m])
    runs, all_stats = [], []
    for _ in range(3):
        # re-position the window at the route start UNTIMED: a replay rerun
        # otherwise begins with a cold jump-back swap from the previous
        # run's arc end — a bench-loop artifact real serving never pays
        wpipe._set_window(start_xy)
        wpipe.window_stats = {k: (0 if isinstance(v, int) else 0.0)
                              for k, v in wpipe.window_stats.items()}
        t0 = time.time()
        wpipe.run_frames(log, batches=batches, chunk=8)
        runs.append(max(time.time() - t0 - RTT, 1e-9))
        all_stats.append(dict(wpipe.window_stats))
    best = min(runs)
    stats = all_stats[int(np.argmin(runs))]  # the stats OF the best run
    stats["scans_per_s_median"] = round(len(log.scan_t) / np.median(runs), 2)
    # secondary: the per-frame streaming loop (one dispatch per frame) for
    # the chunked-vs-streamed split
    wpipe.run_frames(log, batches=batches)  # compile the per-frame program
    wpipe._set_window(start_xy)  # untimed re-position (see above)
    t0 = time.time()
    wpipe.run_frames(log, batches=batches)
    stream = max(time.time() - t0 - RTT, 1e-9)
    stats = {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in stats.items()}
    stats["stream_scans_per_s"] = round(len(log.scan_t) / stream, 2)
    return len(log.scan_t) / best, stats, applied


def bench_ekf_steps(pipe):
    """EKF predict steps/sec (27-state propagate, in-device loop)."""
    from elimaloc_tpu.ekf import ImuMeas, predict_imu

    state = pipe.reset()
    state = state.replace(
        ekf=state.ekf.replace(
            reset_for_init_prediction=jnp.asarray(False),
            state_initialized=jnp.asarray(True),
        )
    )
    k = 20000

    def run(ekf):
        def body(i, s):
            imu = ImuMeas(
                timestamp=0.001 * (i + 1).astype(jnp.float32),
                acc=jnp.asarray([0.0, 0.0, 9.81], jnp.float32),
                gyro=jnp.asarray([0.0, 0.0, 0.01], jnp.float32),
            )
            return predict_imu(s, imu, pipe.params.ekf, pipe.static.ekf_flags)

        return jax.lax.fori_loop(0, k, body, ekf).pos

    f = jax.jit(run)
    float(f(state.ekf)[0])
    t0 = time.time()
    float(f(state.ekf)[0])
    return k / max(time.time() - t0 - RTT, 1e-9)


def bench_icp_batched(pipe, log, batch=8):
    """Independent-scan ICP throughput (the raw registration metric): vmap
    over a batch of downsampled 128k-pt scans against the map."""
    from elimaloc_tpu.map.grid import voxel_downsample
    from elimaloc_tpu.register import run_register
    from elimaloc_tpu.pipeline.log import _traj

    t0_log = float(log.imu_t[0])
    scans, inits = [], []
    batch = min(batch, len(log.scan_t) - 2)  # short BENCH_SCANS smoke runs
    for k in range(2, 2 + batch):
        pts = jnp.asarray(log.scan_points[k], jnp.float32)
        v = jnp.asarray(log.scan_valid[k])
        ds, dsv, _ = jax.jit(
            lambda p, vv: voxel_downsample(p, vv, 1.5, 16384)
        )(pts, v)
        scans.append((ds, dsv))
        pose_t, yaw, _, _, _ = _traj(
            np.array([float(log.scan_t[k]) - t0_log]), ramp=3.0
        )
        T = np.eye(4, dtype=np.float32)
        c, s_ = np.cos(yaw[0]), np.sin(yaw[0])
        T[:2, :2] = [[c, -s_], [s_, c]]
        T[:3, 3] = pose_t[0] + [0.2, -0.1, 0.02]
        inits.append(T)
    ds_b = jnp.stack([a for a, _ in scans])
    dsv_b = jnp.stack([b for _, b in scans])
    init_b = jnp.asarray(np.stack(inits))

    reps = 5

    def run(ds, dsv, init):
        def body(i, c):
            res = jax.vmap(
                lambda s1, v1, i1: run_register(
                    s1, v1, pipe.map, i1, pipe.params.icp,
                    pipe.static.icp_static,
                )
            )(ds, dsv, init)
            # real data dependency (a "* 0" trick is one constant-folding
            # pass away from benchmarking nothing)
            return c + jnp.sum(res.pose[:, :3, 3]) * 1e-12

        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, jnp.float32))

    f = jax.jit(run)
    float(f(ds_b, dsv_b, init_b))
    t0 = time.time()
    float(f(ds_b, dsv_b, init_b))
    return batch * reps / max(time.time() - t0 - RTT, 1e-9)


def _cpu_scan_inputs(pipe, log, k):
    from elimaloc_tpu.pipeline.log import _traj

    t0_log = float(log.imu_t[0])
    stamp = float(log.scan_t[k])
    pts = log.scan_points[k][log.scan_valid[k]].astype(np.float64)
    rel_raw = log.scan_times[k][log.scan_valid[k]].astype(np.float64)
    front = rel_raw[0]
    scan_end = stamp
    scan_cur = stamp + front
    rel = rel_raw - front
    pos, yaw, vel, _, _ = _traj(np.array([scan_cur - t0_log]), ramp=3.0)
    incre = vel[0] * (scan_end - scan_cur)
    init = np.eye(4)
    th = yaw[0]
    init[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    pose_t, _, _, _, _ = _traj(np.array([scan_end - t0_log]), ramp=3.0)
    init[:3, 3] = pose_t[0] + [0.2, -0.1, 0.02]
    return (pts, rel, log.imu_t - t0_log, log.imu_gyro,
            scan_cur - t0_log, scan_end - t0_log, incre, init)


def bench_cpu_numpy(pipe, log):
    """Single-core NumPy reference scan step, truth-initialized."""
    grid = CpuVoxelGrid(pipe.built)
    times = []
    for k in range(2, 2 + CPU_SCANS):
        args = _cpu_scan_inputs(pipe, log, k)
        t1 = time.time()
        pose, ok, fit = cpu_scan_step(grid, *args)
        times.append(time.time() - t1)
        assert ok, "CPU reference ICP failed"
    # best-case CPU time (conservative for the speedup claim on a shared host)
    return 1.0 / float(np.min(times))


def _ensure_native():
    """Load the native C++ module, BUILDING it first if absent.

    The .so is untracked (CLAUDE.md: native code auto-falls back to NumPy),
    so a fresh driver checkout has none — and without it the headline
    ``vs_baseline`` degrades to the NumPy strawman BASELINE.md disavows.
    ``make -C native`` takes seconds; a failed build degrades loudly."""
    import subprocess

    from elimaloc_tpu.map import native_builder

    nb = native_builder.maybe_load()
    if nb is not None and getattr(nb, "_has_scan_step", False):
        return nb
    makedir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native")
    try:
        r = subprocess.run(
            ["make", "-C", makedir], capture_output=True, text=True,
            timeout=300,
        )
    except Exception as e:  # noqa: BLE001 — degrade to NumPy, loudly
        print(f"WARNING: native build failed to launch: {e}", file=sys.stderr)
        return None
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        print("WARNING: native build failed: " + " | ".join(tail),
              file=sys.stderr)
        return None
    nb = native_builder.maybe_load(force_recheck=True)
    if nb is None or not getattr(nb, "_has_scan_step", False):
        print("WARNING: native build succeeded but the module did not load",
              file=sys.stderr)
        return None
    return nb


def bench_cpu_native(pipe, log):
    """Single-core native C++ scan step (same packed map, same math)."""
    nb = _ensure_native()
    if nb is None:
        return None
    times = []
    for k in range(2, 2 + CPU_SCANS):
        pts, rel, imu_t, imu_gyro, scan_cur, scan_end, incre, init = (
            _cpu_scan_inputs(pipe, log, k))
        t1 = time.time()
        res = nb.scan_step_p2p(
            pipe.built, pts, rel, imu_t, imu_gyro, scan_cur, scan_end,
            incre, init)
        times.append(time.time() - t1)
        assert res is not None and res[1], "native scan step failed"
    return 1.0 / float(np.min(times))


def bench_methods():
    """Per-ICP-method fused throughput + accuracy + TPU-vs-oracle parity on
    a smaller self-contained log (VERDICT items 1 and 5)."""
    world = make_world(seed=7, extent=60.0, n_ground=150_000, n_wall=80_000)
    log = synthesize_log(
        world, duration=(METHOD_SCANS + 3) * 0.1, points_per_scan=16384,
        max_range=60.0, seed=8,
    )
    built = build_voxel_map(
        world, 1.0, 30,
        compute_voxel_cov=True, compute_point_cov=True,
        use_native=True,
    )
    out = {}
    # BASELINE config 5 flagship: AVGICP with the full PCM/GPS/CAN fusion
    cases = [(m, False) for m in (IcpMethod.P2P, IcpMethod.GICP,
                                  IcpMethod.VGICP, IcpMethod.AVGICP)]
    cases.append((IcpMethod.AVGICP, True))
    for method, full_fusion in cases:
        t_case = time.time()
        cfg = _cfg(method)
        if full_fusion:
            cfg.ekf.use_gps = True
            cfg.ekf.use_can = True
        pipe = LocalizationPipeline(
            cfg, built, ds_points=4096,
            tile_budget=TileQueryBudget(qb=16, max_slots=1024),
            ego_ring_size=512, imu_ring_size=256,
        )
        state, outs = pipe.run_fused(log)
        float(jnp.sum(outs["ego_pos"]))
        runs = []
        for _ in range(METHOD_REPEATS):
            t0 = time.time()
            state, outs = pipe.run_fused(log)
            float(jnp.sum(outs["ego_pos"]))
            runs.append(max(time.time() - t0 - RTT, 1e-9))
        dt, dt_med = min(runs), float(np.median(runs))
        pos = np.asarray(outs["ego_pos"])
        t_abs = np.asarray(outs["ego_t_abs"])
        ate = ate_rmse(t_abs, pos, log.truth_t, log.truth_pos)

        t_oracle = time.time()
        oracle = CpuPipeline(cfg, built, ego_ring_size=512, imu_ring_size=256)
        # frame_ordered: the fused mode batches can/gps per scan frame (a
        # documented deterministic reordering, replay_fused docstring); the
        # parity metric isolates NUMERICS by matching that order. With
        # strict time order the full-fusion P2P case reads ~25 mm of pure
        # ordering skew vs 1.6 mm of actual numeric divergence.
        ctraj = oracle.run(log, time_base=pipe.time_base, frame_ordered=True)
        n = min(len(pos), len(ctraj["pos"]))
        err = np.linalg.norm(pos[:n] - ctraj["pos"][:n], axis=1)
        parity = float(np.sqrt(np.mean(err ** 2)))
        name = method.name + ("+GPS+CAN" if full_fusion else "")
        print(f"bench: methods case {name} done in "
              f"{time.time() - t_case:.0f}s (oracle "
              f"{time.time() - t_oracle:.0f}s)", file=sys.stderr, flush=True)
        out[name] = {
            "scans_per_s": round(len(log.scan_t) / dt, 2),
            "scans_per_s_median": round(len(log.scan_t) / dt_med, 2),
            "ate_m": round(ate, 4),
            "oracle_parity_ate_m": round(parity, 4),
            "applied": round(float(np.asarray(outs["applied"]).mean()), 3),
        }
        if full_fusion:
            # The fusion row's closed-loop ATE is dominated by the synthetic
            # GPS noise, not by TPU numerics (oracle parity is mm-scale). The
            # f64 oracle's OWN ATE on the same noisy-GPS log is the noise
            # floor the TPU number must be judged against (VERDICT r3 #7).
            floor = ate_rmse(ctraj["t"], ctraj["pos"],
                             log.truth_t, log.truth_pos)
            out[name]["gps_noise_floor_ate_m"] = round(floor, 4)
    return out


def bench_roofline(pipe, log, frame_ms):
    """Measured HBM/VPU roofline of the fused frame (VERDICT r4 missing #1):
    on-chip ceiling measurements + the analytic byte/flop model of the frame
    at bench shapes, reported as ``roofline_frac`` = bound/measured. See
    elimaloc_tpu/utils/roofline.py; the hot loops being modeled are the
    reference's voxel_hash_map.cpp:31-88 + registration.cpp:15-66."""
    from elimaloc_tpu.pipeline.runtime import build_fused_batches
    from elimaloc_tpu.utils.roofline import roofline_report

    state = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=pipe.time_base)
    # one (already-compiled) replay for the executed-iteration count
    _, outs = pipe._fused(state, batches, pipe.map)
    float(jnp.sum(outs["ego_pos"]))
    return roofline_report(pipe, outs, batches, frame_ms)


def bench_reloc():
    """Cold-registration (relocalization) latency (VERDICT r4 missing #3):
    initialize_at-style registrations from a 0.4 m / 5 deg initial-pose
    error at the full max_iteration=10 budget — the many-iteration regime
    the reference's initial-pose alignment runs in (pcm_matching.cpp:356-447)
    and the claimed win region of correspondence reuse (corr_refresh_dist_m,
    measured honestly negative for warm 1.7-iteration serving in round 4).
    Reports per-registration latency and executed GN iterations with reuse
    OFF (reference behavior) and ON (0.5 m refresh bound)."""
    from elimaloc_tpu.map.grid import voxel_downsample
    from elimaloc_tpu.register import (
        make_icp_params, make_icp_static, run_register,
    )
    from elimaloc_tpu.pipeline.log import _traj

    world = make_world(seed=7, extent=60.0, n_ground=150_000, n_wall=80_000)
    log = synthesize_log(
        world, duration=1.6, points_per_scan=16384, max_range=60.0, seed=8,
    )
    cfg = _cfg()
    pipe = LocalizationPipeline(
        cfg, world, ds_points=4096,
        tile_budget=TileQueryBudget(qb=16, max_slots=1024),
        ego_ring_size=64, imu_ring_size=64,
    )
    t0_log = float(log.imu_t[0])
    rng = np.random.default_rng(11)
    batch = min(8, len(log.scan_t) - 2)
    scans, inits = [], []
    for k in range(2, 2 + batch):
        pts = jnp.asarray(log.scan_points[k], jnp.float32)
        v = jnp.asarray(log.scan_valid[k])
        ds, dsv, _ = jax.jit(
            lambda p, vv: voxel_downsample(p, vv, 1.0, 4096)
        )(pts, v)
        scans.append((ds, dsv))
        pose_t, yaw, _, _, _ = _traj(
            np.array([float(log.scan_t[k]) - t0_log]), ramp=3.0
        )
        # reloc-grade init error: 0.4 m translation (random planar heading)
        # + 5 deg yaw — pcm's initialize regime, not warm odometry
        th_err = np.deg2rad(5.0) * rng.choice([-1.0, 1.0])
        d_xy = 0.4 * np.array([np.cos(a := rng.uniform(0, 2 * np.pi)),
                               np.sin(a)])
        T = np.eye(4, dtype=np.float32)
        c, s_ = np.cos(yaw[0] + th_err), np.sin(yaw[0] + th_err)
        T[:2, :2] = [[c, -s_], [s_, c]]
        T[:3, 3] = pose_t[0] + [d_xy[0], d_xy[1], 0.03]
        inits.append(T)
    ds_b = jnp.stack([a for a, _ in scans])
    dsv_b = jnp.stack([b for _, b in scans])
    init_b = jnp.asarray(np.stack(inits))

    out = {}
    poses = {}
    for tag, refresh in (("no_reuse", 0.0), ("reuse", 0.5)):
        cfg2 = _cfg()
        cfg2.pcm.corr_refresh_dist_m = refresh
        static = make_icp_static(
            cfg2.pcm, backend="tile",
            tile_budget=pipe.static.icp_static.tile_budget,
        )
        params = make_icp_params(cfg2.pcm, dtype=jnp.float32)

        @jax.jit
        def run(ds, dsv, init):
            return jax.vmap(
                lambda s1, v1, i1: run_register(
                    s1, v1, pipe.map, i1, params, static,
                )
            )(ds, dsv, init)

        res = run(ds_b, dsv_b, init_b)  # compile
        float(jnp.sum(res.pose[:, :3, 3]))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            res = run(ds_b, dsv_b, init_b)
            float(jnp.sum(res.pose[:, :3, 3]))
            best = min(best, max(time.time() - t0 - RTT, 1e-9))
        poses[tag] = np.asarray(res.pose[:, :3, 3])
        out[tag] = dict(
            reloc_ms=round(best / batch * 1e3, 3),
            gn_iterations=round(float(np.asarray(res.iterations).mean()), 2),
            success=round(float(np.asarray(res.success).mean()), 3),
        )
    # the two variants must converge to the same registration (the reuse
    # fixed-point equivalence is pinned <=1 cm by tests/test_icp.py; this
    # records it at bench scale)
    out["variant_agreement_m"] = round(float(np.max(np.linalg.norm(
        poses["reuse"] - poses["no_reuse"], axis=1))), 4)
    return out


def bench_fleet(pipe, log, lanes=8):
    """Multi-stream serving throughput: ``lanes`` independent replay lanes
    vmapped on the one chip (run_fused_fleet). Fleet-vs-single lane parity
    is pinned by tests/test_pipeline_modes.py; this measures total scans/s.
    Lanes replay the same log tensor (identical-lane timing is valid — the
    TPU does not dedupe lanes) so the extra H2D over the relay stays small.
    """
    from elimaloc_tpu.parallel import replay_fused_fleet, stack_streams
    from elimaloc_tpu.pipeline.runtime import build_fused_batches

    state = pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=pipe.time_base)
    bcast = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (lanes,) + x.shape), t)
    st_b = jax.device_put(bcast(state))
    bt_b = jax.device_put(bcast(batches))
    _, outs = replay_fused_fleet(st_b, bt_b, pipe.map, pipe.params,
                                 pipe.static)
    float(jnp.sum(outs["ego_pos"]))
    n = len(log.scan_t)
    dt = np.inf
    for _ in range(2):
        t0 = time.time()
        _, outs = replay_fused_fleet(st_b, bt_b, pipe.map, pipe.params,
                                     pipe.static)
        float(jnp.sum(outs["ego_pos"]))
        dt = min(dt, max(time.time() - t0 - RTT, 1e-9))
    return lanes * n / dt


# Error signatures of a relay/TPU-worker fault. Only these get a retry (a
# deterministic phase failure reproduces on attempt 2 and just doubles the
# wasted wall-clock), and only these latch the poisoned-client flag.
_TRANSIENT_PATTERNS = (
    "worker process crashed", "unavailable", "restarted", "deadline",
    "socket closed", "connection reset",
)
# Once a phase exhausts its retry on a relay/worker fault, the PJRT client
# is poisoned — there is no in-process recovery — so every remaining
# in-process TPU phase would burn up to the relay's ~15-min internal timeout
# per attempt before failing the same way. Latch and short-circuit.
_client_poisoned = False


def _guard(label, fn, default, tpu: bool = True):
    """Run an OPTIONAL bench phase; degrade to ``default`` instead of killing
    the one-JSON-line contract. The shared axon relay can drop the TPU worker
    mid-run (observed 2026-08-18: `TPU worker process crashed or restarted`
    during the fleet phase right after a relay outage); one retry covers the
    transient case, deterministic failures fall straight through, and a
    relay fault that survives the retry poisons the client for all remaining
    TPU phases (crash-PRONE phases run in subprocesses instead — see
    _phase_in_subprocess)."""
    global _client_poisoned
    if tpu and _client_poisoned:
        print(f"WARNING: bench phase {label!r} skipped: TPU client poisoned "
              "by an earlier relay fault", file=sys.stderr)
        return default
    for attempt in (1, 2):
        try:
            t0 = time.time()
            out = fn()
            print(f"bench: phase {label!r} done in {time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)
            return out
        except Exception as e:  # noqa: BLE001 — any phase fault degrades
            msg = f"{type(e).__name__}: {e}"
            print(f"WARNING: bench phase {label!r} failed "
                  f"(attempt {attempt}): {msg}", file=sys.stderr)
            transient = any(p in msg.lower() for p in _TRANSIENT_PATTERNS)
            if not transient:
                return default
            if attempt == 2 and tpu:
                _client_poisoned = True
    return default


def _phase_in_subprocess(phase: str, timeout_s: int = 1800):
    """Run a crash-prone TPU phase in a FRESH process and parse its one JSON
    line. A TPU-worker crash poisons the parent's PJRT client with no
    in-process recovery, so isolation is the only way to both attempt the
    phase and survive it (round-3 official bench: the in-process fleet
    attempt crashed the worker twice and recorded null). The child re-execs
    this script with BENCH_PHASE set; builds are deterministic (fixed
    seeds), so its pipe/log match the parent's."""
    import subprocess

    env = dict(os.environ, BENCH_PHASE=phase)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"WARNING: bench subprocess phase {phase!r} timed out "
              f"({timeout_s}s)", file=sys.stderr)
        return "timeout"
    if r.stderr:
        sys.stderr.write(r.stderr)
    if r.returncode != 0:
        print(f"WARNING: bench subprocess phase {phase!r} exited "
              f"{r.returncode}", file=sys.stderr)
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"WARNING: bench subprocess phase {phase!r} printed no JSON",
          file=sys.stderr)
    return None


def _run_phase(phase: str) -> None:
    """BENCH_PHASE child entry: run one phase, print one JSON line."""
    if phase == "fleet":
        pipe, log = build_everything()
        print(json.dumps({"fleet8_scans_per_s": bench_fleet(pipe, log)}))
    else:
        raise SystemExit(f"unknown BENCH_PHASE {phase!r}")


def _rnd(v, nd=2):
    return None if v is None else round(v, nd)


def main():
    t0 = time.time()
    pipe, log = build_everything()
    print(f"bench: build_everything done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    # host-load proxy (VERDICT r4 missing #2): the native baseline is timed
    # BEFORE and AFTER the TPU phases; the pre/post ratio is the same-session
    # host-load indicator that lets a reader separate shared-host noise from
    # a real TPU regression when comparing rounds
    cpu_native_pre = _guard("cpu_native_pre",
                            lambda: bench_cpu_native(pipe, log), None,
                            tpu=False)
    t0 = time.time()
    r = bench_tpu(pipe, log)  # headline — a failure here SHOULD crash
    print(f"bench: phase 'headline' done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    lat = _guard("latency", lambda: bench_latency(pipe, log), {})
    roofline = _guard(
        "roofline",
        lambda: bench_roofline(pipe, log, 1e3 / r["scans_per_s"]), None)
    stream_sps = _guard("streaming", lambda: bench_streaming(pipe, log), None)
    windowed_sps, window_stats, windowed_applied = _guard(
        "windowed", lambda: bench_windowed(pipe, log), (None, None, None))
    icp_sps = _guard("icp_batched", lambda: bench_icp_batched(pipe, log), None)
    ekf_sps = _guard("ekf", lambda: bench_ekf_steps(pipe), None)
    reloc = {} if SKIP_METHODS else _guard("reloc", bench_reloc, {})
    methods = {} if SKIP_METHODS else _guard("methods", bench_methods, {})
    # fleet runs in an ISOLATED SUBPROCESS: the big 8-lane vmapped program is
    # the phase most likely to trip a flaky relay (observed 2026-08-18,
    # twice in the round-3 official capture), and a relay-side worker crash
    # poisons the whole client process with no in-process PJRT recovery — a
    # child process can crash without taking the parent's remaining phases
    # (or the JSON line) with it. Costs one extra deterministic
    # build_everything + compile; that is the price of a non-null record.
    t0 = time.time()
    fleet_res = _phase_in_subprocess("fleet")
    if fleet_res == "timeout":
        # a timed-out child is not the relay crash mode — a retry would
        # burn another full timeout for the same result
        fleet_res = None
    elif fleet_res is None:
        # one retry: the observed crash mode is relay-state-dependent and a
        # fresh child gets a fresh PJRT client
        fleet_res = _phase_in_subprocess("fleet")
        if fleet_res == "timeout":
            fleet_res = None
    fleet_sps = (fleet_res or {}).get("fleet8_scans_per_s")
    print(f"bench: phase 'fleet' done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    cpu_native_post = _guard("cpu_native_post",
                             lambda: bench_cpu_native(pipe, log), None,
                             tpu=False)
    t0 = time.time()
    cpu_numpy_sps = bench_cpu_numpy(pipe, log)
    print(f"bench: phase 'cpu_numpy' done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    natives = [x for x in (cpu_native_pre, cpu_native_post) if x]
    # the FASTEST native observation is the conservative denominator for the
    # speedup claim (a loaded-host native run would inflate vs_baseline)
    cpu_native_sps = max(natives) if natives else None
    baseline = cpu_native_sps if cpu_native_sps else cpu_numpy_sps
    host_load_ratio = (round(max(natives) / min(natives), 2)
                       if len(natives) == 2 else None)
    print(
        json.dumps(
            {
                "metric": "fused localization scans/sec (128k-pt scans, "
                          "deskew+P2P ICP+EKF)",
                "value": round(r["scans_per_s"], 2),
                "unit": "scans/s",
                "vs_baseline": round(r["scans_per_s"] / baseline, 2),
                "baseline_kind": (
                    "native C++ single-core scan step" if cpu_native_sps
                    else "NumPy single-core scan step"
                ),
                # variance evidence (VERDICT r4 missing #2): repeat counts,
                # best AND median per row, raw headline spread, and the
                # pre/post native-baseline host-load proxy
                "repeats": {
                    "headline": HEADLINE_REPEATS,
                    "methods": METHOD_REPEATS,
                    "latency_frames": lat.get("frames"),
                },
                "headline_median_scans_per_s": _rnd(
                    r.get("scans_per_s_median")),
                "headline_run_times_s": r.get("run_times_s"),
                "cpu_native_scans_per_s": (
                    round(cpu_native_sps, 3) if cpu_native_sps else None
                ),
                "cpu_native_pre_scans_per_s": _rnd(cpu_native_pre, 3),
                "cpu_native_post_scans_per_s": _rnd(cpu_native_post, 3),
                "host_load_ratio": host_load_ratio,
                "cpu_numpy_scans_per_s": round(cpu_numpy_sps, 3),
                "streaming_scans_per_s": _rnd(stream_sps),
                # active-window mode (48 m window / 40 m gate — a separate,
                # smaller workload than the 100 m-gate headline; see
                # bench_windowed): swap machinery folded into the rate
                "windowed_scans_per_s": _rnd(windowed_sps),
                "windowed_applied": _rnd(windowed_applied, 3),
                "window_stats": window_stats,
                # serving mode: 8 vmapped lanes on this one chip; the dp
                # projection is lanes x chips with ZERO cross-chip
                # communication (replay_fused_dp partitions the identical
                # per-lane program; validated on the virtual 8-device mesh
                # by dryrun_multichip) — a projection, not a measurement,
                # labeled as such because only one physical chip is attached
                "fleet8_scans_per_s": _rnd(fleet_sps),
                "fleet8_vs_baseline": _rnd(
                    fleet_sps / baseline if fleet_sps else None),
                "projected_v5e8_dp_scans_per_s": _rnd(
                    8 * fleet_sps if fleet_sps else None),
                # host-measured single-frame latency, and the min-of-3
                # device+dispatch floor that strips relay/host hiccups
                # (VERDICT r4 #10: if p95 - device_p95 is large, the tail is
                # relay jitter, not a straggler thunk)
                "latency_p50_ms": _rnd(lat.get("p50_ms")),
                "latency_p95_ms": _rnd(lat.get("p95_ms")),
                "latency_device_p50_ms": _rnd(lat.get("device_p50_ms")),
                "latency_device_p95_ms": _rnd(lat.get("device_p95_ms")),
                # measured HBM/VPU roofline of the frame (VERDICT r4 #1):
                # roofline_frac = analytic bound / measured frame time
                "roofline": roofline,
                # cold-registration (relocalization) row: 0.4 m / 5 deg init
                # error at max_iteration=10, corr reuse off vs on
                "reloc": reloc,
                "icp_batched_scans_per_s": _rnd(icp_sps),
                "ekf_steps_per_s": _rnd(ekf_sps, 1),
                "ate_rmse_m": round(r["ate"], 4),
                "ate_tail_m": round(r["ate_tail"], 4),
                "applied_ratio": round(r["applied"], 3),
                "ds_kept_max": r["ds_kept"],
                "ds_budget": r["ds_budget"],
                "ds_headroom": r["ds_headroom"],
                "slots_dropped": r["dropped"],
                "flops_per_scan": round(r["flops_per_scan"]),
                "achieved_tflops": r["achieved_tflops"],
                "mfu_bf16_peak": r["mfu_bf16_peak"],
                "host_batch_prep_s": round(r["host_prep"], 3),
                "per_method": methods,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    _PHASE = os.environ.get("BENCH_PHASE")
    if _PHASE:
        _run_phase(_PHASE)
    else:
        main()
