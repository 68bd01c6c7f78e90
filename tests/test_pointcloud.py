"""PointCloud2-converter equivalents (reference: pcm_matching.cpp:900-930)."""

import numpy as np

from elimaloc_tpu.pipeline import (
    OUSTER_FIELDS,
    VELODYNE_FIELDS,
    convert_scan,
    decode_cloud,
    ouster_to_xyzit,
    velodyne_to_xyzit,
)
from elimaloc_tpu.pipeline.pointcloud import OUSTER_POINT_STEP, VELODYNE_POINT_STEP


def _pack_ouster(n, seed=0):
    rng = np.random.default_rng(seed)
    rec = np.zeros(n, dtype={
        "names": [f[0] for f in OUSTER_FIELDS],
        "offsets": [f[1] for f in OUSTER_FIELDS],
        "formats": ["f4", "f4", "f4", "f4", "u4", "u2", "u2", "u2", "u4"],
        "itemsize": OUSTER_POINT_STEP,
    })
    rec["x"] = rng.normal(size=n).astype(np.float32)
    rec["y"] = rng.normal(size=n).astype(np.float32)
    rec["z"] = rng.normal(size=n).astype(np.float32)
    rec["intensity"] = rng.uniform(0, 255, n).astype(np.float32)
    rec["t"] = (rng.uniform(0, 0.1, n) * 1e9).astype(np.uint32)
    rec["reflectivity"] = rng.integers(0, 65535, n, dtype=np.uint16)
    rec["ring"] = rng.integers(0, 128, n, dtype=np.uint16)
    return rec, rec.tobytes()


def _pack_velodyne(n, seed=1):
    rng = np.random.default_rng(seed)
    rec = np.zeros(n, dtype={
        "names": [f[0] for f in VELODYNE_FIELDS],
        "offsets": [f[1] for f in VELODYNE_FIELDS],
        "formats": ["f4", "f4", "f4", "f4", "u2", "f4"],
        "itemsize": VELODYNE_POINT_STEP,
    })
    for k in ("x", "y", "z", "intensity", "time"):
        rec[k] = rng.normal(size=n).astype(np.float32)
    rec["ring"] = rng.integers(0, 32, n, dtype=np.uint16)
    return rec, rec.tobytes()


def test_decode_cloud_fields():
    rec, buf = _pack_ouster(37)
    f = decode_cloud(buf, OUSTER_FIELDS, OUSTER_POINT_STEP)
    for name in ("x", "y", "z", "t", "reflectivity", "ring"):
        np.testing.assert_array_equal(f[name], rec[name])


def test_velodyne_passthrough_no_subsampling():
    rec, buf = _pack_velodyne(101)
    xyz, inten, time = velodyne_to_xyzit(buf)
    assert len(xyz) == 101  # Cloudmsg2cloud converts every point
    np.testing.assert_array_equal(xyz[:, 0], rec["x"])
    np.testing.assert_array_equal(inten, rec["intensity"])
    np.testing.assert_array_equal(time, rec["time"])


def test_ouster_subsample_and_remap():
    rec, buf = _pack_ouster(103)
    xyz, inten, time = ouster_to_xyzit(buf, index_sampling=5)
    # 103/5 -> 21 sampled points; 103 % 5 != 0 so no trailing default
    assert len(xyz) == 21
    np.testing.assert_array_equal(xyz[:, 0], rec["x"][::5])
    # intensity <- reflectivity (cpp:916), time <- t * 1e-9 (cpp:917)
    np.testing.assert_array_equal(inten, rec["reflectivity"][::5].astype(np.float32))
    np.testing.assert_allclose(time, rec["t"][::5] * 1e-9, rtol=1e-6)


def test_ouster_trailing_default_quirk():
    # n % stride == 0 leaves one default-constructed point (cpp:908-911)
    rec, buf = _pack_ouster(100)
    xyz, inten, time = ouster_to_xyzit(buf, index_sampling=5)
    assert len(xyz) == 21  # 100/5 + 1
    np.testing.assert_array_equal(xyz[20], [0.0, 0.0, 0.0])
    assert time[20] == 0.0
    np.testing.assert_array_equal(xyz[:20, 1], rec["y"][::5])


def test_convert_scan_dispatch():
    _, obuf = _pack_ouster(50)
    _, vbuf = _pack_velodyne(50)
    xyz_o, _, _ = convert_scan("ouster", obuf, index_sampling=2)
    xyz_v, _, _ = convert_scan("velodyne", vbuf, index_sampling=2)
    assert len(xyz_o) == 26  # 50/2 + 1 (quirk)
    assert len(xyz_v) == 50  # sampling ignored off the ouster path
