"""Deskew property tests: constant-twist scans must map to the scan-end frame."""

import jax.numpy as jnp
import numpy as np

from elimaloc_tpu import deskew

import ref_numpy as ref

RNG = np.random.default_rng(17)


def yaw_rot(yaw):
    return ref.euler_to_rot([0.0, 0.0, yaw])


def simulate_scan(world, t0, span, vel, yaw_rate, n_imu=20):
    """Sensor translating at `vel` (global) and yawing at `yaw_rate`; each
    point i is measured at time t_i in the sensor frame of that instant."""
    n = len(world)
    times = np.linspace(0.0, span, n)
    pts = np.zeros((n, 3))
    for i, (w, t) in enumerate(zip(world, times)):
        pos = vel * t
        R = yaw_rot(yaw_rate * t)
        pts[i] = R.T @ (w - pos)
    # IMU ring covering the scan
    imu_t = t0 + np.linspace(-0.005, span + 0.005, n_imu)
    imu_gyro = np.tile([0.0, 0.0, yaw_rate], (n_imu, 1))
    # Odom ring: poses along the trajectory (local vel = R^T v is x-forward)
    ring_t = t0 + np.linspace(-0.05, span + 0.02, 12)
    ring_pos = vel[None] * (ring_t - t0)[:, None]
    ring_rpy = np.c_[np.zeros((12, 2)), yaw_rate * (ring_t - t0)]
    ring_vel_local = np.stack(
        [yaw_rot(y).T @ vel for y in ring_rpy[:, 2]]
    )
    ring_gyro = np.tile([0.0, 0.0, yaw_rate], (12, 1))
    return times, pts, (imu_t, imu_gyro), (ring_t, ring_pos, ring_rpy,
                                           ring_vel_local, ring_gyro)


def build_info(t0, span, imu, ring):
    imu_t, imu_gyro = imu
    ring_t, ring_pos, ring_rpy, ring_vl, ring_g = ring
    return deskew.make_deskew_info(
        jnp.asarray(imu_t), jnp.asarray(imu_gyro),
        jnp.ones(len(imu_t), bool),
        jnp.asarray(ring_t), jnp.asarray(ring_pos), jnp.asarray(ring_rpy),
        jnp.asarray(ring_vl), jnp.asarray(ring_g),
        jnp.ones(len(ring_t), bool),
        jnp.asarray(t0), jnp.asarray(t0 + span),
    )


class TestDeskew:
    def test_static_scan_unchanged(self):
        world = RNG.uniform(-10, 10, (128, 3))
        t0, span = 1000.0, 0.1
        times, pts, imu, ring = simulate_scan(
            world, t0, span, np.zeros(3), 0.0
        )
        info = build_info(t0, span, imu, ring)
        out, ok = deskew.deskew_points(
            jnp.asarray(pts), jnp.asarray(times), jnp.ones(128, bool), info
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(out), pts, atol=1e-9)

    def test_constant_twist_compensation(self):
        world = RNG.uniform(-15, 15, (256, 3))
        t0, span = 1000.0, 0.1
        vel = np.array([8.0, 1.0, 0.0])
        yaw_rate = 0.4
        times, pts, imu, ring = simulate_scan(world, t0, span, vel, yaw_rate)
        info = build_info(t0, span, imu, ring)
        assert bool(info.imu_available) and bool(info.odom_available)
        out, ok = deskew.deskew_points(
            jnp.asarray(pts), jnp.asarray(times), jnp.ones(256, bool), info
        )
        # Ground truth: every point expressed in the scan-END sensor frame.
        pos_end = vel * span
        R_end = yaw_rot(yaw_rate * span)
        want = (world - pos_end) @ R_end
        err_deskew = np.linalg.norm(np.asarray(out) - want, axis=1)
        err_raw = np.linalg.norm(pts - want, axis=1)
        # Raw scan has up to |vel|*span ~ 0.8 m error; deskew must cut it hard.
        assert err_raw.max() > 0.5
        assert err_deskew.mean() < err_raw.mean() / 10
        assert err_deskew.max() < 0.08

    def test_odom_extrapolation_matches_measured(self):
        """Truncate the odom ring before scan end: the velocity extrapolation
        path must approximate the measured-end path."""
        world = RNG.uniform(-15, 15, (128, 3))
        t0, span = 1000.0, 0.1
        vel = np.array([5.0, 0.0, 0.0])
        times, pts, imu, ring = simulate_scan(world, t0, span, vel, 0.0)
        info_full = build_info(t0, span, imu, ring)
        ring_t = ring[0]
        keep = ring_t <= t0 + 0.5 * span
        ring_cut = tuple(r[keep] for r in ring)
        info_cut = build_info(t0, span, imu, ring_cut)
        assert bool(info_cut.odom_available)
        np.testing.assert_allclose(
            np.asarray(info_cut.odom_incre),
            np.asarray(info_full.odom_incre),
            atol=1e-6,
        )

    def test_unavailable_when_imu_missing(self):
        world = RNG.uniform(-5, 5, (32, 3))
        t0, span = 1000.0, 0.1
        times, pts, imu, ring = simulate_scan(world, t0, span, np.zeros(3), 0.0)
        imu_t = imu[0] + 100.0  # all outside the window
        info = deskew.make_deskew_info(
            jnp.asarray(imu_t), jnp.asarray(imu[1]), jnp.ones(len(imu_t), bool),
            jnp.asarray(ring[0]), jnp.asarray(ring[1]), jnp.asarray(ring[2]),
            jnp.asarray(ring[3]), jnp.asarray(ring[4]),
            jnp.ones(len(ring[0]), bool),
            jnp.asarray(t0), jnp.asarray(t0 + span),
        )
        assert not bool(info.imu_available)
        out, ok = deskew.deskew_points(
            jnp.asarray(pts), jnp.asarray(times), jnp.ones(32, bool), info
        )
        assert not bool(ok)
        np.testing.assert_array_equal(np.asarray(out), pts)  # passthrough

    def test_bug_compat_z_reproduces_reference_typo(self):
        world = RNG.uniform(-15, 15, (64, 3))
        t0, span = 1000.0, 0.1
        vel = np.array([2.0, 0.0, 1.0])  # non-zero z increment
        yaw_rate = 0.3
        times, pts, imu, ring = simulate_scan(world, t0, span, vel, yaw_rate)
        info = build_info(t0, span, imu, ring)
        out_fix, _ = deskew.deskew_points(
            jnp.asarray(pts), jnp.asarray(times), jnp.ones(64, bool), info
        )
        out_bug, _ = deskew.deskew_points(
            jnp.asarray(pts), jnp.asarray(times), jnp.ones(64, bool), info,
            bug_compat_z=True,
        )
        # x/y are untouched by the quirk
        np.testing.assert_allclose(
            np.asarray(out_bug)[:, :2], np.asarray(out_fix)[:, :2], atol=1e-12
        )
        incre = np.asarray(info.odom_incre)
        rel = np.asarray(times)
        # Integrated gyro-z at point time: integration is anchored at the
        # first included IMU sample, 5 ms before scan start.
        rot_z_cur = yaw_rate * (rel + 0.005)
        ratio = rel / span
        z_fix = ratio * incre[2] - incre[2]
        z_bug = rot_z_cur - incre[2]
        np.testing.assert_allclose(
            np.asarray(out_bug)[:, 2] - np.asarray(out_fix)[:, 2],
            z_bug - z_fix,
            atol=1e-6,
        )


class TestScanTimeNormalization:
    def test_scan_time_end_mode(self):
        times = np.linspace(-0.1, 0.0, 64)  # negative offsets, end mode
        rel, cur, end = deskew.normalize_scan_times(
            jnp.asarray(times), jnp.ones(64, bool), 500.0, scan_time_end=True
        )
        assert float(end) == 500.0
        assert abs(float(cur) - 499.9) < 1e-9
        np.testing.assert_allclose(np.asarray(rel), times + 0.1, atol=1e-12)

    def test_scan_time_start_mode(self):
        times = np.linspace(0.0, 0.1, 64)
        rel, cur, end = deskew.normalize_scan_times(
            jnp.asarray(times), jnp.ones(64, bool), 500.0, scan_time_end=False
        )
        assert float(cur) == 500.0
        assert abs(float(end) - 500.1) < 1e-9
        np.testing.assert_allclose(np.asarray(rel), times, atol=1e-12)


class TestRingHeadroom:
    """The reference reserves 2000 IMU slots (pcm_matching.hpp:113) and
    silently anchors its integration at whatever survives the deque prune
    (pcm_matching.cpp:536-549). Pin that edge: a 400 Hz IMU with a delayed
    scan deskews exactly when the ring holds the scan window, and the
    roll-off case is OBSERVABLE via imu_covers_start instead of silent."""

    def _rolling_ring(self, imu_t, imu_gyro, size):
        """Feed samples through a fixed ring; keep the LAST `size`."""
        if len(imu_t) <= size:
            pad = size - len(imu_t)
            t = np.concatenate([imu_t, np.zeros(pad)])
            g = np.concatenate([imu_gyro, np.zeros((pad, 3))])
            v = np.concatenate([np.ones(len(imu_t), bool), np.zeros(pad, bool)])
            return t, g, v
        return imu_t[-size:], imu_gyro[-size:], np.ones(size, bool)

    def test_400hz_delayed_scan(self):
        world = RNG.uniform(-15, 15, (256, 3))
        t0, span = 500.0, 0.1
        yaw_rate = 0.6
        vel = np.array([4.0, 0.5, 0.0])
        times, pts, _, ring = simulate_scan(world, t0, span, vel, yaw_rate)
        # 400 Hz IMU stream that keeps arriving for 1 s AFTER the scan
        # (processing delay) — 0.1 s window + 1.0 s tail = ~440 samples
        imu_t = np.arange(t0 - 0.02, t0 + span + 1.0, 1.0 / 400.0)
        imu_gyro = np.tile([0.0, 0.0, yaw_rate], (len(imu_t), 1))

        # 512-slot ring: window retained, full-cover deskew, matches analytic
        t_big, g_big, v_big = self._rolling_ring(imu_t, imu_gyro, 512)
        info = deskew.make_deskew_info(
            jnp.asarray(t_big), jnp.asarray(g_big), jnp.asarray(v_big),
            *[jnp.asarray(a) for a in ring], jnp.ones(len(ring[0]), bool),
            jnp.asarray(t0), jnp.asarray(t0 + span),
        )
        assert bool(info.imu_available) and bool(info.imu_covers_start)
        out, ok = deskew.deskew_points(
            jnp.asarray(pts), jnp.asarray(times), jnp.ones(256, bool), info
        )
        assert bool(ok)
        expect = (world - (vel * span)) @ yaw_rot(yaw_rate * span)
        err = np.linalg.norm(np.asarray(out) - expect, axis=1)
        err_raw = np.linalg.norm(pts - expect, axis=1)
        # same first-order deskew accuracy bound as the constant-twist test
        assert err.mean() < err_raw.mean() / 3
        assert err.max() < 0.15, err.max()

        # 256-slot ring at 400 Hz: 1 s of tail evicted the scan window —
        # the partial anchor must be FLAGGED, not silent
        t_sm, g_sm, v_sm = self._rolling_ring(imu_t, imu_gyro, 256)
        info_sm = deskew.make_deskew_info(
            jnp.asarray(t_sm), jnp.asarray(g_sm), jnp.asarray(v_sm),
            *[jnp.asarray(a) for a in ring], jnp.ones(len(ring[0]), bool),
            jnp.asarray(t0), jnp.asarray(t0 + span),
        )
        assert not bool(info_sm.imu_covers_start)
