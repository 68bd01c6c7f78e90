"""rosbag ingest: record/chunk framing, message deserializers, ReplayLog
assembly — round-tripped against a minimal in-test bag writer (the
environment has no ROS; the writer below emits the documented v2.0 wire
format, http://wiki.ros.org/Bags/Format/2.0)."""

import bz2
import struct

import numpy as np
import pytest

from elimaloc_tpu.ops import geo
from elimaloc_tpu.pipeline import make_world, synthesize_log
from elimaloc_tpu.pipeline.pointcloud import (
    FLOAT32, UINT16, VELODYNE_POINT_STEP,
)
from elimaloc_tpu.pipeline.rosbag import bag_to_replay_log, read_bag


# --------------------------------------------------------------------------- #
# minimal bag writer
# --------------------------------------------------------------------------- #

def _fields(**kv) -> bytes:
    out = b""
    for name, value in kv.items():
        f = name.encode() + b"=" + value
        out += struct.pack("<I", len(f)) + f
    return out


def _record(header: bytes, data: bytes) -> bytes:
    return (struct.pack("<I", len(header)) + header
            + struct.pack("<I", len(data)) + data)


def _time(t: float) -> bytes:
    secs = int(t)
    return struct.pack("<II", secs, int(round((t - secs) * 1e9)))


def _connection(cid: int, topic: str, mtype: str) -> bytes:
    hdr = _fields(op=b"\x07", conn=struct.pack("<I", cid),
                  topic=topic.encode())
    data = _fields(topic=topic.encode(), type=mtype.encode(),
                   md5sum=b"0" * 32, message_definition=b"")
    return _record(hdr, data)


def _message(cid: int, t: float, raw: bytes) -> bytes:
    hdr = _fields(op=b"\x02", conn=struct.pack("<I", cid), time=_time(t))
    return _record(hdr, raw)


def _chunk(inner: bytes, compression: str = "none") -> bytes:
    data = bz2.compress(inner) if compression == "bz2" else inner
    hdr = _fields(op=b"\x05", compression=compression.encode(),
                  size=struct.pack("<I", len(inner)))
    return _record(hdr, data)


def _bag(chunks, top_level=b"") -> bytes:
    banner = b"#ROSBAG V2.0\n"
    baghdr = _record(
        _fields(op=b"\x03", index_pos=struct.pack("<Q", 0),
                conn_count=struct.pack("<I", 0),
                chunk_count=struct.pack("<I", len(chunks))),
        b" " * 64,
    )
    return banner + baghdr + top_level + b"".join(chunks)


# message encoders ---------------------------------------------------------- #

def _header(t: float, frame: str = "f") -> bytes:
    fb = frame.encode()
    return (struct.pack("<I", 0) + _time(t)
            + struct.pack("<I", len(fb)) + fb)


def _enc_imu(t, quat_xyzw, gyro, acc) -> bytes:
    return (_header(t)
            + struct.pack("<4d", *quat_xyzw) + struct.pack("<9d", *([0.0] * 9))
            + struct.pack("<3d", *gyro) + struct.pack("<9d", *([0.0] * 9))
            + struct.pack("<3d", *acc) + struct.pack("<9d", *([0.0] * 9)))


def _enc_navsatfix(t, lat, lon, alt, cov_diag) -> bytes:
    cov = np.zeros((3, 3))
    np.fill_diagonal(cov, cov_diag)
    return (_header(t) + struct.pack("<bH", 0, 1)
            + struct.pack("<3d", lat, lon, alt)
            + struct.pack("<9d", *cov.ravel()) + struct.pack("<B", 2))


def _enc_twist_stamped(t, vx, wz) -> bytes:
    return (_header(t) + struct.pack("<3d", vx, 0.0, 0.0)
            + struct.pack("<3d", 0.0, 0.0, wz))


def _enc_pointcloud2(t, xyz, times) -> bytes:
    """Velodyne driver layout (pointcloud.VELODYNE_FIELDS)."""
    n = len(xyz)
    rec = np.zeros(n, np.dtype({
        "names": ["x", "y", "z", "intensity", "ring", "time"],
        "offsets": [0, 4, 8, 12, 16, 18],
        "formats": [np.float32] * 4 + [np.uint16, np.float32],
        "itemsize": VELODYNE_POINT_STEP,
    }))
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["time"] = times
    data = rec.tobytes()
    fields = [("x", 0, FLOAT32), ("y", 4, FLOAT32), ("z", 8, FLOAT32),
              ("intensity", 12, FLOAT32), ("ring", 16, UINT16),
              ("time", 18, FLOAT32)]
    out = _header(t, "lidar") + struct.pack("<II", 1, n)
    out += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        nb = name.encode()
        out += (struct.pack("<I", len(nb)) + nb
                + struct.pack("<IBI", off, dt, 1))
    out += struct.pack("<B", 0)                      # is_bigendian
    out += struct.pack("<II", VELODYNE_POINT_STEP,
                       VELODYNE_POINT_STEP * n)
    out += struct.pack("<I", len(data)) + data
    out += struct.pack("<B", 1)                      # is_dense
    return out


# --------------------------------------------------------------------------- #

SCAN = "/velodyne_points"
IMU = "/imu/data"
GPS = "/fix"
CAN = "/can/twist"

CONNS = {SCAN: (0, "sensor_msgs/PointCloud2"),
         IMU: (1, "sensor_msgs/Imu"),
         GPS: (2, "sensor_msgs/NavSatFix"),
         CAN: (3, "geometry_msgs/TwistStamped")}


def _write_synth_bag(tmp_path, log, compression="none", gps=None, can=None):
    inner = b"".join(
        _connection(cid, topic, mtype)
        for topic, (cid, mtype) in CONNS.items()
    )
    events = []
    for t, acc, gyro in zip(log.imu_t, log.imu_acc, log.imu_gyro):
        events.append((t, _message(CONNS[IMU][0], t,
                                   _enc_imu(t, (0, 0, 0, 1), gyro, acc))))
    for i, t in enumerate(log.scan_t):
        v = log.scan_valid[i]
        events.append((t, _message(
            CONNS[SCAN][0], t,
            _enc_pointcloud2(t, log.scan_points[i][v], log.scan_times[i][v]),
        )))
    for t, lat, lon, alt, cd in gps or []:
        events.append((t, _message(CONNS[GPS][0], t,
                                   _enc_navsatfix(t, lat, lon, alt, cd))))
    for t, vx, wz in can or []:
        events.append((t, _message(CONNS[CAN][0], t,
                                   _enc_twist_stamped(t, vx, wz))))
    events.sort(key=lambda e: e[0])
    inner += b"".join(r for _, r in events)
    path = tmp_path / "drive.bag"
    path.write_bytes(_bag([_chunk(inner, compression)]))
    return str(path)


@pytest.fixture(scope="module")
def tiny_log():
    world = make_world(seed=5, extent=60.0, n_ground=20_000, n_wall=8_000)
    return synthesize_log(world, duration=1.0, points_per_scan=256,
                          max_range=40.0, seed=6)


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_roundtrip_synth_log(tmp_path, tiny_log, compression):
    log = tiny_log
    t0 = float(log.imu_t[0])
    gps = [(t0 + 0.1, 37.3, 127.0, 40.0, (2.0, 2.5, 9.0)),
           (t0 + 0.6, 37.3005, 127.0004, 41.0, (1.0, 1.0, 4.0))]
    can = [(t0 + 0.2, 5.0, 0.1), (t0 + 0.7, 5.5, -0.2)]
    path = _write_synth_bag(tmp_path, log, compression, gps=gps, can=can)

    out = bag_to_replay_log(path, SCAN, IMU, gps_topic=GPS, can_topic=CAN,
                            ref_origin=(37.3, 127.0, 40.0))

    np.testing.assert_allclose(out.imu_t, log.imu_t, atol=1e-8)
    np.testing.assert_allclose(out.imu_gyro, log.imu_gyro, atol=1e-12)
    np.testing.assert_allclose(out.imu_acc, log.imu_acc, atol=1e-12)
    np.testing.assert_allclose(out.scan_t, log.scan_t, atol=1e-8)
    assert out.scan_points.shape[0] == log.scan_points.shape[0]
    for i in range(len(log.scan_t)):
        v = log.scan_valid[i]
        k = int(v.sum())
        assert out.scan_valid[i, :k].all()
        assert not out.scan_valid[i, k:].any()
        np.testing.assert_allclose(out.scan_points[i, :k],
                                   log.scan_points[i][v], rtol=1e-6)
        np.testing.assert_allclose(out.scan_times[i, :k],
                                   log.scan_times[i][v], rtol=1e-5)
    # GPS projected exactly as ops.geo with the given origin
    want = np.asarray(geo.project_gps_point(
        np.array([g[1] for g in gps]), np.array([g[2] for g in gps]),
        np.array([g[3] for g in gps]), 37.3, 127.0, 40.0))
    np.testing.assert_allclose(out.gps_pos, want, atol=1e-9)
    np.testing.assert_allclose(out.gps_cov, [g[4] for g in gps])
    np.testing.assert_allclose(out.can_vel, [c[1] for c in can])
    np.testing.assert_allclose(out.can_yaw_rate, [c[2] for c in can])


def test_read_bag_streams_types(tmp_path, tiny_log):
    path = _write_synth_bag(tmp_path, tiny_log)
    types = {m.msg_type for m in read_bag(path)}
    assert types == {"sensor_msgs/PointCloud2", "sensor_msgs/Imu"}
    only_imu = list(read_bag(path, topics=[IMU]))
    assert {m.topic for m in only_imu} == {IMU}
    assert len(only_imu) == len(tiny_log.imu_t)


def _enc_pointcloud2_organized(t, xyz, times, height, row_pad) -> bytes:
    """Velodyne layout, organized (height>1) with per-row alignment padding
    (row_step > width*point_step, allowed by the PointCloud2 spec)."""
    n = len(xyz)
    assert n % height == 0
    width = n // height
    rec = np.zeros(n, np.dtype({
        "names": ["x", "y", "z", "intensity", "ring", "time"],
        "offsets": [0, 4, 8, 12, 16, 18],
        "formats": [np.float32] * 4 + [np.uint16, np.float32],
        "itemsize": VELODYNE_POINT_STEP,
    }))
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["time"] = times
    row_bytes = rec.tobytes()
    row_step = width * VELODYNE_POINT_STEP + row_pad
    data = b"".join(
        row_bytes[r * width * VELODYNE_POINT_STEP:
                  (r + 1) * width * VELODYNE_POINT_STEP] + b"\xee" * row_pad
        for r in range(height)
    )
    fields = [("x", 0, FLOAT32), ("y", 4, FLOAT32), ("z", 8, FLOAT32),
              ("intensity", 12, FLOAT32), ("ring", 16, UINT16),
              ("time", 18, FLOAT32)]
    out = _header(t, "lidar") + struct.pack("<II", height, width)
    out += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        nb = name.encode()
        out += (struct.pack("<I", len(nb)) + nb
                + struct.pack("<IBI", off, dt, 1))
    out += struct.pack("<B", 0)
    out += struct.pack("<II", VELODYNE_POINT_STEP, row_step)
    out += struct.pack("<I", len(data)) + data
    out += struct.pack("<B", 1)
    return out


def test_row_padded_organized_cloud(tmp_path, tiny_log):
    """height>1 clouds with row alignment padding decode to the same points
    as the dense encoding (the decoder must not stride across the pad)."""
    log = tiny_log
    t = float(log.scan_t[0])
    v = log.scan_valid[0]
    xyz = log.scan_points[0][v][:64]
    times = log.scan_times[0][v][:64]
    inner = _connection(0, SCAN, "sensor_msgs/PointCloud2")
    inner += _connection(1, IMU, "sensor_msgs/Imu")
    inner += _message(
        0, t, _enc_pointcloud2_organized(t, xyz, times, height=4, row_pad=7))
    for ti, acc, gyro in zip(log.imu_t[:5], log.imu_acc, log.imu_gyro):
        inner += _message(1, ti, _enc_imu(ti, (0, 0, 0, 1), gyro, acc))
    path = tmp_path / "organized.bag"
    path.write_bytes(_bag([_chunk(inner)]))
    out = bag_to_replay_log(str(path), SCAN, IMU)
    assert int(out.scan_valid[0].sum()) == 64
    np.testing.assert_allclose(out.scan_points[0][:64], xyz, rtol=1e-6)
    np.testing.assert_allclose(out.scan_times[0][:64], times, rtol=1e-5)


def test_gps_projection_f64_without_x64(tmp_path, tiny_log):
    """Bag GPS import must be full f64 even when jax_enable_x64 is OFF (the
    production default — conftest enables it for tests, so this runs in a
    clean subprocess). jnp-projected ENU at ECEF magnitudes used to lose
    ~0.8 m to f32 cancellation."""
    import os
    import subprocess
    import sys

    t0 = float(tiny_log.imu_t[0])
    gps = [(t0 + 0.1, 37.3, 127.0, 40.0, (1.0, 1.0, 1.0)),
           (t0 + 0.5, 37.3005, 127.0004, 41.0, (1.0, 1.0, 1.0))]
    path = _write_synth_bag(tmp_path, tiny_log, gps=gps)
    code = f"""
import numpy as np
from elimaloc_tpu.pipeline.rosbag import bag_to_replay_log
from elimaloc_tpu.ops import geo
out = bag_to_replay_log({path!r}, {SCAN!r}, {IMU!r}, gps_topic={GPS!r},
                        ref_origin=(37.3, 127.0, 40.0))
want = geo.project_gps_point(
    np.array([37.3, 37.3005]), np.array([127.0, 127.0004]),
    np.array([40.0, 41.0]), 37.3, 127.0, 40.0, xp=np)
print(float(np.abs(out.gps_pos - want).max()))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_ENABLE_X64", None)
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert float(res.stdout.strip().splitlines()[-1]) < 1e-9


def test_bad_banner_raises(tmp_path):
    path = tmp_path / "bad.bag"
    path.write_bytes(b"#ROSBAG V1.2\nxxxx")
    with pytest.raises(ValueError, match="v2.0"):
        list(read_bag(str(path)))


def test_first_fix_becomes_origin(tmp_path, tiny_log):
    t0 = float(tiny_log.imu_t[0])
    gps = [(t0 + 0.1, 37.3, 127.0, 40.0, (1.0, 1.0, 1.0)),
           (t0 + 0.5, 37.3001, 127.0, 40.0, (1.0, 1.0, 1.0))]
    path = _write_synth_bag(tmp_path, tiny_log, gps=gps)
    out = bag_to_replay_log(path, SCAN, IMU, gps_topic=GPS)
    np.testing.assert_allclose(out.gps_pos[0], [0, 0, 0], atol=1e-9)
    assert out.gps_pos[1][1] > 10.0  # ~11 m north per 1e-4 deg lat


# --------------------------------------------------------------------------- #
# LZ4 (roslz4 chunks)
# --------------------------------------------------------------------------- #

from elimaloc_tpu.pipeline.lz4f import block_decompress, frame_decompress


def _lz4_literal_block(payload: bytes) -> bytes:
    """Encode one all-literals LZ4 block (a valid final sequence)."""
    n = len(payload)
    if n < 15:
        return bytes([n << 4]) + payload
    out = bytearray([0xF0])
    rem = n - 15
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)
    return bytes(out) + payload


def _lz4_frame(blocks, flg_extra=0, content_size=None) -> bytes:
    flg = 0x40 | 0x20 | flg_extra          # v01, block-independent
    hdr = struct.pack("<I", 0x184D2204) + bytes([flg, 0x40])
    if content_size is not None:
        flg |= 0x08
        hdr = struct.pack("<I", 0x184D2204) + bytes([flg, 0x40])
        hdr += struct.pack("<Q", content_size)
    hdr += b"\x00"                         # header checksum (not verified)
    body = b""
    for raw, block in blocks:
        size = len(block) | (0x80000000 if raw else 0)
        body += struct.pack("<I", size) + block
        if flg_extra & 0x10:               # block checksum flag
            body += b"\x00\x00\x00\x00"
    body += struct.pack("<I", 0)           # EndMark
    if flg_extra & 0x04:                   # content checksum flag
        body += b"\x00\x00\x00\x00"
    return hdr + body


class TestLz4:
    def test_block_literals_only(self):
        out = bytearray()
        block_decompress(_lz4_literal_block(b"hello world"), out)
        assert bytes(out) == b"hello world"

    def test_block_match_copy(self):
        # "abc" literals then match offset=3 len=9 -> "abc" * 4
        block = bytes([0x35]) + b"abc" + struct.pack("<H", 3)
        block += _lz4_literal_block(b"")
        out = bytearray()
        block_decompress(block, out)
        assert bytes(out) == b"abc" * 4

    def test_block_overlapping_rle(self):
        # "x" literal then match offset=1 len=19 (0xF + 4, ext 0) -> 20 x's
        block = bytes([0x1F]) + b"x" + struct.pack("<H", 1) + bytes([0])
        out = bytearray()
        block_decompress(block, out)
        assert bytes(out) == b"x" * 20

    def test_block_extended_literal_length(self):
        payload = bytes(range(256)) * 2  # 512 literals: 15 + 255 + 242
        out = bytearray()
        block_decompress(_lz4_literal_block(payload), out)
        assert bytes(out) == payload

    def test_frame_raw_and_compressed_blocks(self):
        data = _lz4_frame([
            (True, b"RAWBYTES"),
            (False, bytes([0x35]) + b"abc" + struct.pack("<H", 3)),
        ])
        assert frame_decompress(data) == b"RAWBYTES" + b"abc" * 4

    def test_frame_cross_block_match(self):
        # block-DEPENDENT: second block's match reaches into the first's
        # output (offset 6 spans the boundary)
        first = _lz4_literal_block(b"abcdef")
        second = bytes([0x08]) + struct.pack("<H", 6) + _lz4_literal_block(b"")
        data = _lz4_frame([(False, first), (False, second)],
                          flg_extra=0)
        # the 12-byte match at offset 6 replicates "abcdef" twice
        assert frame_decompress(data) == b"abcdef" * 3

    def test_frame_skips_checksums_and_content_size(self):
        data = _lz4_frame([(True, b"payload")], flg_extra=0x10 | 0x04,
                          content_size=7)
        assert frame_decompress(data) == b"payload"

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            frame_decompress(b"\x00\x00\x00\x00rest")


def test_lz4_bag_roundtrip(tmp_path, tiny_log):
    """A full bag whose chunk is an lz4 frame of literal blocks."""
    inner = _connection(1, IMU, "sensor_msgs/Imu")
    for t, acc, gyro in zip(tiny_log.imu_t, tiny_log.imu_acc,
                            tiny_log.imu_gyro):
        inner += _message(1, t, _enc_imu(t, (0, 0, 0, 1), gyro, acc))
    frame = _lz4_frame([(False, _lz4_literal_block(inner))])
    hdr = _fields(op=b"\x05", compression=b"lz4",
                  size=struct.pack("<I", len(inner)))
    path = tmp_path / "lz4.bag"
    path.write_bytes(_bag([_record(hdr, frame)]))
    msgs = list(read_bag(str(path)))
    assert len(msgs) == len(tiny_log.imu_t)
    assert all(m.msg_type == "sensor_msgs/Imu" for m in msgs)
