"""PCD map I/O (reference: pcm_matching.cpp:69-79 loads .pcd maps via PCL;
launch files encode the geodetic origin in the filename)."""

import numpy as np
import pytest

from elimaloc_tpu.map import (
    parse_origin_from_filename,
    read_pcd,
    read_pcd_points,
    write_pcd,
)
from elimaloc_tpu.map import native_builder
from elimaloc_tpu.map.pcd import _lzf_decompress


def _cloud(n=257, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(scale=40.0, size=(n, 3)).astype(np.float32)


@pytest.mark.parametrize("mode", ["ascii", "binary"])
def test_write_read_roundtrip(tmp_path, mode):
    pts = _cloud()
    path = str(tmp_path / f"m_{mode}.pcd")
    write_pcd(path, pts, mode=mode)
    got = read_pcd_points(path)
    tol = 1e-5 if mode == "ascii" else 0.0  # ascii writes %.6f
    np.testing.assert_allclose(got, pts.astype(np.float64), atol=tol)


def test_nan_rows_dropped(tmp_path):
    pts = _cloud(50)
    pts[7] = np.nan
    pts[31, 2] = np.inf
    path = str(tmp_path / "nan.pcd")
    write_pcd(path, pts, mode="binary")
    got = read_pcd_points(path)
    assert len(got) == 48
    keep = np.isfinite(pts).all(axis=1)
    np.testing.assert_allclose(got, pts[keep].astype(np.float64))


def test_read_binary_extra_fields(tmp_path):
    # PCL maps often carry intensity; xyz extraction must skip it.
    n = 16
    rng = np.random.default_rng(3)
    rec = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("intensity", "f4")])
    for f in rec.dtype.names:
        rec[f] = rng.normal(size=n).astype(np.float32)
    hdr = ("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
           "TYPE F F F F\nCOUNT 1 1 1 1\n"
           f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
           f"POINTS {n}\nDATA binary\n")
    path = str(tmp_path / "i.pcd")
    with open(path, "wb") as fh:
        fh.write(hdr.encode())
        fh.write(rec.tobytes())
    f = read_pcd(path)
    np.testing.assert_array_equal(f["intensity"], rec["intensity"])
    pts = read_pcd_points(path)
    np.testing.assert_allclose(
        pts, np.stack([rec["x"], rec["y"], rec["z"]], 1).astype(np.float64))


# ---- LZF / binary_compressed ------------------------------------------------

def _lzf_compress_literal(raw: bytes) -> bytes:
    """Trivial all-literal LZF encoder (valid stream, no back references)."""
    out = bytearray()
    for i in range(0, len(raw), 32):
        chunk = raw[i:i + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def test_lzf_backref_stream():
    # literal "abc" then a 6-byte back reference at offset 3 -> "abcabcabc"
    stream = bytes([2]) + b"abc" + bytes([(4 << 5), 2])
    assert _lzf_decompress(stream, 9) == b"abcabcabc"


def test_lzf_long_backref_stream():
    # len field 7 -> extension byte; 3+2+7+200 = 212 total output bytes
    stream = bytes([2]) + b"xyz" + bytes([(7 << 5), 200, 2])
    out = _lzf_decompress(stream, 3 + 7 + 200 + 2)
    assert out == (b"xyz" * 71)[: 3 + 209]


def test_lzf_python_matches_native():
    lib = native_builder.maybe_load()
    if lib is None or not lib._has_lzf:
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 7, size=5000, dtype=np.uint8).tobytes()
    stream = _lzf_compress_literal(raw)
    assert lib.lzf_decompress(stream, len(raw)) == raw


def test_read_binary_compressed(tmp_path, monkeypatch):
    # binary_compressed stores fields SoA (all x, then all y, ...)
    pts = _cloud(64, seed=5)
    raw = pts.T.astype(np.float32).tobytes()  # x-block, y-block, z-block
    comp = _lzf_compress_literal(raw)
    hdr = ("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
           "COUNT 1 1 1\nWIDTH 64\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
           "POINTS 64\nDATA binary_compressed\n")
    path = str(tmp_path / "c.pcd")
    with open(path, "wb") as fh:
        fh.write(hdr.encode())
        fh.write(np.array([len(comp), len(raw)], np.uint32).tobytes())
        fh.write(comp)
    got = read_pcd_points(path)
    np.testing.assert_allclose(got, pts.astype(np.float64))

    # force the pure-Python LZF path and re-read
    monkeypatch.setattr(native_builder, "maybe_load", lambda: None)
    got2 = read_pcd_points(path)
    np.testing.assert_allclose(got2, pts.astype(np.float64))


def test_read_ascii_with_comments(tmp_path):
    path = str(tmp_path / "a.pcd")
    body = ("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
            "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n"
            "DATA ascii\n1.0 2.0 3.0\n-4.5 0.25 9.0\n")
    with open(path, "wb") as fh:
        fh.write(body.encode())
    got = read_pcd_points(path)
    np.testing.assert_allclose(got, [[1, 2, 3], [-4.5, 0.25, 9.0]])


# ---- filename origin convention ---------------------------------------------

def test_parse_origin_from_filename():
    assert parse_origin_from_filename(
        "/maps/37.558200_127.044500_66.000000_hanyang_02m.pcd"
    ) == (37.558200, 127.044500, 66.000000)
    assert parse_origin_from_filename(
        "-12.500000_-77.100000_0.000000_lima.pcd"
    ) == (-12.5, -77.1, 0.0)
    assert parse_origin_from_filename("hanyang_map.pcd") is None
    assert parse_origin_from_filename("plain.npy") is None


def test_cli_loads_pcd(tmp_path):
    from elimaloc_tpu.cli import _load_map_points

    pts = _cloud(33)
    path = str(tmp_path / "m.pcd")
    write_pcd(path, pts)
    got = _load_map_points(path)
    np.testing.assert_allclose(got, pts.astype(np.float64))
