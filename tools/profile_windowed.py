"""Windowed (active-window) chunked-replay profiler — VERDICT r4 item #1.

Replays the bench workload through the 48 m window / 40 m gate pipeline
(bench.bench_windowed geometry) with per-run window_stats and wall-clock,
plus a ladder event log, so prefetch/swap behavior is visible per run.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_windowed.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax  # noqa: E402

import bench  # noqa: E402
from elimaloc_tpu.pipeline import LocalizationPipeline  # noqa: E402
from elimaloc_tpu.pipeline.runtime import build_fused_batches  # noqa: E402

RTT = 0.035


def main():
    chunk = int(os.environ.get("PW_CHUNK", 8))
    runs = int(os.environ.get("PW_RUNS", 4))
    pipe, log = bench.build_everything()
    cfg = bench._cfg()
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

    # instrument the ladder
    orig = wpipe._maybe_rewindow
    events = []
    t_run0 = [0.0]

    def spy(pos_xy, lookahead_xy=None):
        before = dict(wpipe.window_stats)
        c_before = tuple(np.round(np.asarray(wpipe._window_center), 1))
        orig(pos_xy, lookahead_xy)
        delta = {k: wpipe.window_stats[k] - before[k]
                 for k in before if wpipe.window_stats[k] != before[k]}
        events.append(
            f"  t={time.time() - t_run0[0]:6.3f} consult pos="
            f"{np.round(np.asarray(pos_xy), 1)} "
            f"la={None if lookahead_xy is None else np.round(np.asarray(lookahead_xy), 1)} "
            f"center={c_before}" + (f" -> {delta}" if delta else "")
        )

    wpipe._maybe_rewindow = spy

    n = len(log.scan_t)
    start_xy = np.array([cfg.ekf.ekf_init_x_m, cfg.ekf.ekf_init_y_m])
    state, outs = wpipe.run_frames(log, batches=batches, chunk=chunk)
    print(f"compile run: applied={np.asarray(outs['applied']).mean():.3f} "
          f"stats={wpipe.window_stats}", flush=True)
    for r in range(runs):
        pf = wpipe._prefetch
        if pf is not None:
            pf["done"].wait()
            wpipe._prefetch = None
        wpipe._set_window(start_xy)
        wpipe.window_stats = {k: (0 if isinstance(v, int) else 0.0)
                              for k, v in wpipe.window_stats.items()}
        events.clear()
        t_run0[0] = time.time()
        t0 = time.time()
        _, outs = wpipe.run_frames(log, batches=batches, chunk=chunk)
        dt = max(time.time() - t0 - RTT, 1e-9)
        stats = {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in wpipe.window_stats.items()}
        print(f"run {r}: {n / dt:7.2f} scans/s  "
              f"applied={np.asarray(outs['applied']).mean():.3f}  {stats}",
              flush=True)
        for e in events:
            print(e, flush=True)


if __name__ == "__main__":
    main()
