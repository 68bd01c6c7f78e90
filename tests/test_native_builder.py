"""Native C++ builder vs NumPy fallback: identical insertion semantics."""

import numpy as np
import pytest

from elimaloc_tpu.map import native_builder
from elimaloc_tpu.map.builder import _insert_points_numpy


def _canon(vc, blk, cnt):
    order = np.lexsort((vc[:, 2], vc[:, 1], vc[:, 0]))
    return vc[order], blk[order], cnt[order]


@pytest.mark.skipif(
    native_builder.maybe_load() is None,
    reason="native lib not built (make -C native)",
)
def test_native_matches_numpy():
    nb = native_builder.maybe_load()
    rng = np.random.default_rng(5)
    pts = rng.uniform(-20, 20, size=(20000, 3))
    vc_n, blk_n, cnt_n = _canon(*nb.insert_points(pts, 1.0, 10))
    vc_p, blk_p, cnt_p = _canon(*_insert_points_numpy(pts, 1.0, 10))
    np.testing.assert_array_equal(vc_n, vc_p)
    np.testing.assert_array_equal(cnt_n, cnt_p)
    mask = np.arange(10)[None, :] < cnt_n[:, None]
    np.testing.assert_allclose(blk_n[mask], blk_p[mask])


@pytest.mark.skipif(
    native_builder.maybe_load() is None,
    reason="native lib not built (make -C native)",
)
def test_native_negative_coords_floor():
    nb = native_builder.maybe_load()
    pts = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
    vc, _, cnt = nb.insert_points(pts, 1.0, 5)
    assert {tuple(c) for c in vc} == {(-1, -1, -1), (0, 0, 0)}
    assert (cnt == 1).all()
