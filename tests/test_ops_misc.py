"""Tests for frame conversions, geodetic projection, and config loading."""

import os

import jax.numpy as jnp
import numpy as np

from elimaloc_tpu.config import (
    ConfigWatcher,
    ElimalocConfig,
    GpsType,
    IcpMethod,
    export_ini,
    load_calibration_ini,
    load_localization_ini,
)
from elimaloc_tpu.ops import frames, geo

import ref_numpy as ref

RNG = np.random.default_rng(3)


class TestFrames:
    def test_global_local_velocity_roundtrip(self):
        v = RNG.normal(size=3)
        rpy = RNG.uniform(-1.0, 1.0, 3)
        loc = frames.global_to_local_velocity(jnp.asarray(v), jnp.asarray(rpy))
        np.testing.assert_allclose(
            np.asarray(loc), ref.global_to_local_velocity(v, rpy), atol=1e-12
        )
        back = frames.local_to_global_velocity(loc, jnp.asarray(rpy))
        np.testing.assert_allclose(np.asarray(back), v, atol=1e-12)

    def test_angular_rate_matrix_matches_reference(self):
        """Verbatim re-derivation of hpp:538-543."""
        rate = RNG.normal(size=3)
        rpy = RNG.uniform(-1.0, 1.0, 3)
        r, p, _ = rpy
        want = np.array(
            [
                rate[0] - rate[2] * np.sin(p),
                rate[1] * np.cos(r) + rate[2] * np.sin(r) * np.cos(p),
                -rate[1] * np.sin(r) + rate[2] * np.cos(r) * np.cos(p),
            ]
        )
        got = frames.local_to_global_angular_rate(jnp.asarray(rate), jnp.asarray(rpy))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)

    def test_imu_to_ego_centrifugal(self):
        """hpp:149-181: acc' = R acc + w x (w x (-r))."""
        acc = RNG.normal(size=3)
        gyr = RNG.normal(size=3)
        rot = ref.so3_exp(RNG.normal(size=3) * 0.1)
        lever = np.array([0.5, 0.1, -0.2])
        a, g = frames.imu_to_ego(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(rot), jnp.asarray(lever)
        )
        g_np = rot @ gyr
        want_a = rot @ acc + np.cross(g_np, np.cross(g_np, -lever))
        np.testing.assert_allclose(np.asarray(g), g_np, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a), want_a, atol=1e-12)


class TestGeo:
    REF = (37.5583664, 127.0454771, 50.0)  # Hanyang-ish

    def test_roundtrip(self):
        xyz = np.array([123.4, -567.8, 9.1])
        lat, lon, h = geo.unproject_local_point(jnp.asarray(xyz), *self.REF)
        back = geo.project_gps_point(lat, lon, h, *self.REF)
        np.testing.assert_allclose(np.asarray(back), xyz, atol=1e-6)

    def test_origin_maps_to_zero(self):
        out = geo.project_gps_point(*self.REF, *self.REF)
        np.testing.assert_allclose(np.asarray(out), np.zeros(3), atol=1e-9)

    def test_small_offsets_match_sphere_approx(self):
        dlat = 0.001  # ~111 m north
        out = np.asarray(
            geo.project_gps_point(self.REF[0] + dlat, self.REF[1], self.REF[2], *self.REF)
        )
        assert abs(out[1] - 110.87e3 * dlat) < 0.5  # meridian arc at 37.5N
        assert abs(out[0]) < 1e-3


class TestUtm:
    """projection_mode = UTM (localization.ini:14 — dead config in the
    reference, live here; validated against the standard UTM definition)."""

    def test_known_vector_cn_tower(self):
        # 43*38'33.24"N 79*23'13.7"W -> zone 17, 630084 E / 4833438 N
        e, n, zone = geo.utm_forward(43.0 + 38 / 60 + 33.24 / 3600,
                                     -(79.0 + 23 / 60 + 13.7 / 3600))
        assert zone == 17
        assert abs(float(e) - 630084.0) < 1.5
        assert abs(float(n) - 4833438.0) < 1.5

    def test_forward_reverse_roundtrip(self):
        rng = np.random.default_rng(0)
        lats = rng.uniform(-70, 70, 64)
        lons = rng.uniform(-179, 179, 64)
        for lat, lon in zip(lats, lons):
            zone = geo.utm_zone(lon)
            e, n, _ = geo.utm_forward(lat, lon, zone=zone)
            lat2, lon2 = geo.utm_reverse(e, n, zone, southern=lat < 0)
            assert abs(float(lat2) - lat) < 1e-8
            assert abs(float(lon2) - lon) < 1e-8

    def test_southern_false_northing(self):
        e, n, zone = geo.utm_forward(-33.8568, 151.2153)
        assert zone == 56
        assert 0.0 < float(n) < 1e7  # 10,000 km false northing applied

    def test_local_utm_projection_roundtrip(self):
        ref = (37.5582, 127.0445, 66.0)
        xyz = np.array([[120.0, -340.0, 4.0], [0.0, 0.0, 0.0]])
        lat, lon, h = geo.unproject_local_point_utm(xyz, *ref)
        back = np.asarray(geo.project_gps_point_utm(lat, lon, h, *ref))
        # 3rd-order Krueger series truncates at ~n^4*A ~ 1e-5 m
        np.testing.assert_allclose(back, xyz, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(geo.project_gps_point_utm(*ref, *ref)), 0.0, atol=1e-3)

    def test_utm_enu_distances_agree(self):
        # The UTM plane is rotated vs ENU by the grid convergence (~1.2 deg
        # at 2 deg from the zone's central meridian), so components differ;
        # horizontal DISTANCES agree to the UTM scale distortion (<~5e-4).
        ref = (37.5582, 127.0445, 66.0)
        lat, lon, h = geo.unproject_local_point(
            jnp.asarray([150.0, 80.0, 2.0]), *ref)
        utm = np.asarray(geo.project_gps_point_utm(lat, lon, h, *ref))
        np.testing.assert_allclose(
            np.linalg.norm(utm[:2]), np.hypot(150.0, 80.0), rtol=5e-4)
        # UTM z is ellipsoidal height; ENU up differs by d^2/2R curvature
        np.testing.assert_allclose(utm[2], 2.0, atol=5e-3)

    def test_pipeline_project_gps_dispatch(self):
        from elimaloc_tpu.config import ElimalocConfig

        cfg = ElimalocConfig()
        cfg.ekf.ref_latitude, cfg.ekf.ref_longitude, cfg.ekf.ref_height = (
            37.5582, 127.0445, 66.0)
        cfg.pcm.projection_mode = "UTM"
        lat, lon, h = geo.unproject_local_point_utm(
            np.array([50.0, -20.0, 1.0]), 37.5582, 127.0445, 66.0)

        class _P:  # only cfg is consulted by project_gps/unproject
            pass

        from elimaloc_tpu.pipeline.runtime import LocalizationPipeline
        p = _P()
        p.cfg = cfg
        out = LocalizationPipeline.project_gps(p, float(lat), float(lon), float(h))
        np.testing.assert_allclose(out, [50.0, -20.0, 1.0], atol=1e-3)
        la, lo, hh = LocalizationPipeline.unproject(p, out)
        np.testing.assert_allclose([la, lo, hh], [lat, lon, h], rtol=0, atol=1e-7)


class TestConfig:
    def test_load_reference_format_ini(self, tmp_path):
        ini = tmp_path / "localization.ini"
        ini.write_text(
            """
[common_variable]
lidar_type = ouster ; comment
lidar_scan_time_end = 1
[ekf_localization]
use_zupt = 1
gps_type = 1
ekf_init_yaw_deg = 150.13
ekf_state_uncertainty_pos_m = 0.05
[pcm_matching]
icp_method = 3
pcm_voxel_size = 2.0
max_iteration = 7
"""
        )
        cfg = load_localization_ini(str(ini))
        assert cfg.pcm.lidar_type == "ouster"
        assert cfg.ekf.use_zupt is True
        assert cfg.ekf.gps_type == GpsType.BESTPOS
        assert cfg.ekf.ekf_init_yaw_deg == 150.13
        assert cfg.ekf.state_std_pos_m == 0.05
        assert cfg.pcm.icp_method == IcpMethod.AVGICP
        assert cfg.pcm.pcm_voxel_size == 2.0
        assert cfg.pcm.max_iteration == 7
        # untouched keys keep defaults
        assert cfg.pcm.max_search_dist == 5.0

    def test_calibration_vectors(self, tmp_path):
        ini = tmp_path / "calibration.ini"
        ini.write_text(
            """
[Rear To Imu]
transform_xyz_m = 0.0 0.0 0.5
rotation_rpy_deg = -0.7 -1.5 -89.0
[Rear To Gps]
transform_xyz_m = 0.0 0.0 0.5
rotation_rpy_deg = 0.0 0.0 1.3
[Rear To Main LiDAR]
transform_xyz_m = 1.2 0.0 1.88
rotation_rpy_deg = 0.0 1.0 0.5
"""
        )
        cfg = load_calibration_ini(str(ini))
        assert cfg.calib.ego_to_imu_rot_deg == (-0.7, -1.5, -89.0)
        assert cfg.calib.ego_to_lidar_trans == (1.2, 0.0, 1.88)

    def test_hot_reload_mtime_poll(self, tmp_path):
        ini = tmp_path / "localization.ini"
        ini.write_text("[pcm_matching]\nmax_iteration = 5\n")
        w = ConfigWatcher(str(ini))
        assert w.cfg.pcm.max_iteration == 5
        assert w.poll() is False
        ini.write_text("[pcm_matching]\nmax_iteration = 9\n")
        os.utime(ini, ns=(1, 1))  # force distinct mtime
        assert w.poll() is True
        assert w.cfg.pcm.max_iteration == 9

    def test_export_roundtrip(self, tmp_path):
        cfg = ElimalocConfig()
        cfg.pcm.max_iteration = 13
        cfg.ekf.use_can = True
        out = tmp_path / "exported.ini"
        export_ini(cfg, str(out))
        loaded = load_localization_ini(str(out))
        assert loaded.pcm.max_iteration == 13
        assert loaded.ekf.use_can is True
