"""Tests for checkpointing, observability, timing, and the CLI."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from elimaloc_tpu.config import EkfConfig
from elimaloc_tpu.ekf import init_state, make_params
from elimaloc_tpu.map import build_voxel_map
from elimaloc_tpu.utils import (
    StageTimers,
    export_cloud_ply,
    export_trajectory_tum,
    load_built_map,
    load_state,
    save_built_map,
    save_state,
    state_dashboard,
)

RNG = np.random.default_rng(71)


class TestCheckpoint:
    def test_built_map_roundtrip(self, tmp_path):
        pts = RNG.uniform(-10, 10, (2000, 3))
        built = build_voxel_map(
            pts, 1.0, 10, compute_voxel_cov=True, use_native=False
        )
        p = str(tmp_path / "map.npz")
        save_built_map(p, built)
        loaded = load_built_map(p)
        np.testing.assert_array_equal(loaded.vox_coords, built.vox_coords)
        np.testing.assert_array_equal(loaded.counts, built.counts)
        np.testing.assert_array_equal(loaded.table, built.table)
        np.testing.assert_allclose(loaded.vox_cov, built.vox_cov)
        assert loaded.max_probe == built.max_probe
        assert loaded.point_cov is None

    def test_state_roundtrip(self, tmp_path):
        params = make_params(EkfConfig(), dtype=jnp.float64)
        s = init_state(params, dtype=jnp.float64)
        s = s.replace(pos=jnp.asarray([1.0, 2.0, 3.0]))
        p = str(tmp_path / "state.npz")
        save_state(p, s)
        s2 = load_state(p, init_state(params, dtype=jnp.float64))
        np.testing.assert_array_equal(np.asarray(s2.pos), [1.0, 2.0, 3.0])
        np.testing.assert_array_equal(np.asarray(s2.P), np.asarray(s.P))

    @pytest.mark.slow
    def test_pipeline_resume_equivalence(self, tmp_path):
        """Saving mid-log and resuming must reproduce the straight-through run."""
        from elimaloc_tpu.ekf import ImuMeas, predict_imu, EkfFlags

        cfg = EkfConfig()
        params = make_params(cfg, dtype=jnp.float64)
        flags = EkfFlags.from_config(cfg)
        s = init_state(params, dtype=jnp.float64)
        s = s.replace(state_initialized=jnp.asarray(True),
                      reset_for_init_prediction=jnp.asarray(False),
                      prev_timestamp=jnp.float64(0.0))
        for k in range(1, 6):
            s = predict_imu(s, ImuMeas(jnp.float64(0.01 * k),
                                       jnp.asarray([0.0, 0, 9.81]),
                                       jnp.zeros(3)), params, flags)
        p = str(tmp_path / "mid.npz")
        save_state(p, s)
        resumed = load_state(p, init_state(params, dtype=jnp.float64))
        for k in range(6, 11):
            imu = ImuMeas(jnp.float64(0.01 * k), jnp.asarray([0.0, 0, 9.81]),
                          jnp.zeros(3))
            s = predict_imu(s, imu, params, flags)
            resumed = predict_imu(resumed, imu, params, flags)
        np.testing.assert_allclose(np.asarray(s.P), np.asarray(resumed.P))
        np.testing.assert_allclose(np.asarray(s.pos), np.asarray(resumed.pos))


class TestObservability:
    def test_dashboard_renders(self):
        params = make_params(EkfConfig(), dtype=jnp.float64)
        s = init_state(params, dtype=jnp.float64)
        text = state_dashboard(s, EkfConfig())
        assert "State Std" in text and "Yaw" in text

    def test_tum_export(self, tmp_path):
        p = str(tmp_path / "t.tum")
        export_trajectory_tum(
            p, [1.0, 2.0], np.zeros((2, 3)), np.tile([1.0, 0, 0, 0], (2, 1))
        )
        lines = open(p).read().strip().split("\n")
        assert len(lines) == 2 and len(lines[0].split()) == 8

    def test_ply_export_skips_nonfinite(self, tmp_path):
        p = str(tmp_path / "c.ply")
        pts = np.array([[0, 0, 0], [np.inf, 0, 0], [1, 2, 3.0]])
        export_cloud_ply(p, pts)
        txt = open(p).read()
        assert "element vertex 2" in txt


def test_stage_timers():
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


@pytest.mark.slow
def test_cli_synth_and_replay(tmp_path):
    from elimaloc_tpu import cli

    log_p = str(tmp_path / "d.npz")
    map_p = str(tmp_path / "w.npy")
    cli.main(["synth", "--out", log_p, "--map-out", map_p,
              "--duration", "1.5", "--points", "512", "--seed", "2"])
    assert os.path.exists(log_p) and os.path.exists(map_p)
    traj_p = str(tmp_path / "t.tum")
    cli.main(["replay", "--log", log_p, "--map", map_p, "--fused",
              "--ds-points", "512", "--max-slots", "512", "--traj", traj_p])
    assert os.path.exists(traj_p)


def test_cli_build_map(tmp_path):
    from elimaloc_tpu import cli

    pts_p = str(tmp_path / "pts.npy")
    np.save(pts_p, RNG.uniform(-10, 10, (3000, 3)))
    out_p = str(tmp_path / "map.npz")
    cli.main(["build-map", "--points", pts_p, "--out", out_p,
              "--icp-method", "0"])
    loaded = load_built_map(out_p)
    assert loaded.num_voxels > 100


def test_cov_ellipsoid_markers_diagonal():
    """Marker params match the reference construction (pcm_matching.cpp:826-898)."""
    from elimaloc_tpu.utils import cov_ellipsoid_markers

    means = np.array([[1.0, 2.0, 3.0]])
    covs = np.array([np.diag([4.0, 1.0, 0.25])])
    pos, quat, scale, rgb = cov_ellipsoid_markers(means, covs)
    np.testing.assert_allclose(pos[0], [1, 2, 3])
    # descending eigenvalues -> scale 3*sqrt(lambda + 0.01)
    np.testing.assert_allclose(scale[0], 3 * np.sqrt([4.01, 1.01, 0.26]), rtol=1e-12)
    # eigenvectors form identity -> identity quaternion (w,x,y,z)
    np.testing.assert_allclose(np.abs(quat[0]), [1, 0, 0, 0], atol=1e-9)
    # color = |smallest eigenvector| = z axis
    np.testing.assert_allclose(rgb[0], [0, 0, 1], atol=1e-9)


def test_cov_markers_rotation_proper_and_export(tmp_path):
    import json as _json

    from elimaloc_tpu.utils import cov_ellipsoid_markers, export_cov_markers_jsonl
    from elimaloc_tpu.ops import lie

    rng = np.random.default_rng(4)
    n = 16
    # random plane-regularized covs: R diag(1,1,1e-3) R^T
    covs, normals = [], []
    for _ in range(n):
        a = rng.normal(size=3)
        R = np.asarray(lie.so3_exp(jnp.asarray(a)))
        covs.append(R @ np.diag([1.0, 1.0, 1e-3]) @ R.T)
        normals.append(R[:, 2])
    covs = np.stack(covs)
    means = rng.normal(size=(n, 3))
    pos, quat, scale, rgb = cov_ellipsoid_markers(means, covs)
    # quaternions must be unit (proper rotations after the det flip)
    np.testing.assert_allclose(np.linalg.norm(quat, axis=1), 1.0, atol=1e-9)
    # color encodes the plane normal direction
    np.testing.assert_allclose(rgb, np.abs(np.stack(normals)), atol=1e-6)

    path = str(tmp_path / "cov.jsonl")
    export_cov_markers_jsonl(path, means, covs)
    rows = [_json.loads(l) for l in open(path)]
    assert len(rows) == n and rows[0]["alpha"] == 0.5
    np.testing.assert_allclose(rows[3]["pos"], means[3], atol=1e-6)


def test_live_viz_updates_midrun(tmp_path):
    """LiveViz (the reference's continuous rviz stream analog): mid-run
    exports carry the auto-refresh tag, the final export drops it."""
    from elimaloc_tpu.utils.viz import LiveViz

    path = tmp_path / "live.html"
    lv = LiveViz(str(path), refresh_s=0.0)
    for k in range(3):
        lv.on_scan({
            "ego_pos": np.array([float(k), 0.0, 0.0]),
            "ego_t": float(k),
            "fitness": 0.1 * k,
            "iterations": k,
            "overlap": 0.9,
            "applied": True,
        })
    html = path.read_text()
    assert 'http-equiv="refresh"' in html
    assert html.count("[") > 2  # trajectory data present
    lv.finish()
    html = path.read_text()
    assert 'http-equiv="refresh"' not in html
    assert "ICP fitness" in html
