"""Native C++ runtime library: equivalence with the pure-Python fallbacks."""

import numpy as np
import pytest

from acmmp_spherical_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_dmb_native_python_equivalence(tmp_path, rng):
    import acmmp_spherical_tpu.io.dmb as dmb

    arr = rng.random((13, 9, 3)).astype(np.float32)
    native.dmb_write(tmp_path / "a.dmb", arr)
    # python reader on native-written file
    import struct
    raw = (tmp_path / "a.dmb").read_bytes()
    assert struct.unpack("<iiii", raw[:16]) == (1, 13, 9, 3)
    np.testing.assert_array_equal(native.dmb_read(tmp_path / "a.dmb"), arr)
    np.testing.assert_array_equal(dmb.read_dmb(tmp_path / "a.dmb"), arr)


def test_ply_native_matches_python(tmp_path, rng):
    from acmmp_spherical_tpu.io.ply import read_ply

    pts = rng.normal(size=(50, 3)).astype(np.float32)
    pts[3] = [np.nan, 1, 1]
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    col = rng.uniform(0, 255, (50, 3))
    native.ply_write(tmp_path / "n.ply", pts, nrm, col)
    p, n, c = read_ply(tmp_path / "n.ply")
    np.testing.assert_array_equal(p[3], 0.0)
    np.testing.assert_allclose(p[4:], pts[4:])
    np.testing.assert_array_equal(c, np.clip(col, 0, 255).astype(np.uint8))


def test_support_points_matches_python(rng):
    from acmmp_spherical_tpu.config import PriorConfig
    from acmmp_spherical_tpu.pipeline.prior import get_support_points
    import acmmp_spherical_tpu.io.native as nat

    cost = (rng.random((37, 41)) * 0.4).astype(np.float32)
    cfg = PriorConfig()
    sp_native = nat.support_points(cost, cfg.cell_size, cfg.support_cost_threshold)

    # python fallback path
    import unittest.mock as mock
    with mock.patch.object(nat, "available", return_value=False):
        sp_python = get_support_points(cost, cfg)
    assert len(sp_native) == len(sp_python)
    np.testing.assert_array_equal(
        sorted(map(tuple, sp_native)), sorted(map(tuple, sp_python))
    )


def test_rasterize_covers_triangle_interior():
    tri = np.array([[[5, 5], [25, 6], [12, 20]]], np.int32)
    m = native.rasterize_triangles(tri, 30, 30)
    assert m[10, 12] == 1           # interior
    assert m[0, 0] == 0             # outside
    # vertices covered
    assert m[5, 5] == 1 and m[20, 12] == 1


def test_resize_matches_cv2(rng):
    import cv2

    src = rng.random((33, 47)).astype(np.float32)
    out = native.resize_bilinear(src, 20, 31)
    ref = cv2.resize(src, (31, 20), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out, ref, atol=1e-5)
