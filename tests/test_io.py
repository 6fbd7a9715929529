"""I/O round-trip tests (dmb, ply, camera files, pair.txt)."""

import numpy as np
import pytest

from acmmp_spherical_tpu.io import (
    read_dmb, write_dmb, write_ply, read_ply,
    read_camera_file, write_camera_file, read_pair_file, write_pair_file,
    ScenePaths,
)
from acmmp_spherical_tpu.core.camera import PINHOLE, SPHERE


def test_dmb_depth_roundtrip(tmp_path, rng):
    depth = rng.uniform(0, 10, (17, 23)).astype(np.float32)
    p = tmp_path / "d.dmb"
    write_dmb(p, depth)
    # header layout check: int32 (1, h, w, nb) little-endian
    raw = p.read_bytes()
    assert np.frombuffer(raw[:16], np.int32).tolist() == [1, 17, 23, 1]
    np.testing.assert_array_equal(read_dmb(p), depth)


def test_dmb_normal_roundtrip(tmp_path, rng):
    nrm = rng.normal(size=(5, 7, 3)).astype(np.float32)
    p = tmp_path / "n.dmb"
    write_dmb(p, nrm)
    raw = p.read_bytes()
    assert np.frombuffer(raw[:16], np.int32).tolist() == [1, 5, 7, 3]
    np.testing.assert_array_equal(read_dmb(p), nrm)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts[0] = [np.inf, 0, 0]  # non-finite -> zeroed like the reference
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.uniform(0, 255, (100, 3))
    p = tmp_path / "cloud.ply"
    write_ply(p, pts, nrm, col)
    pts2, nrm2, col2 = read_ply(p)
    assert pts2.shape == (100, 3)
    np.testing.assert_array_equal(pts2[0], 0.0)
    np.testing.assert_allclose(pts2[1:], pts[1:])
    np.testing.assert_allclose(nrm2, nrm)
    np.testing.assert_array_equal(col2, np.clip(col, 0, 255).astype(np.uint8))
    # 27-byte vertices, same layout as the reference writer (ACMMP.cpp:489-501)
    header_end = p.read_bytes().index(b"end_header\n") + len(b"end_header\n")
    assert len(p.read_bytes()) - header_end == 100 * 27


def test_camera_file_roundtrip_pinhole(tmp_path):
    K = np.array([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    p = tmp_path / "00000000_cam.txt"
    write_camera_file(p, PINHOLE, R, t, K=K, depth_min=2.5, depth_max=80.0,
                      depth_interval=0.1, num_planes=192)
    cam = read_camera_file(p)
    assert cam.model == PINHOLE
    np.testing.assert_allclose(cam.K, K)
    np.testing.assert_allclose(cam.t, t)
    np.testing.assert_allclose(cam.depth_range, [2.5, 80.0])


def test_camera_file_roundtrip_sphere(tmp_path):
    R = np.eye(3)
    t = np.zeros(3)
    p = tmp_path / "c.txt"
    write_camera_file(p, SPHERE, R, t, sphere_params=[1.0, 512.0, 256.0],
                      depth_min=1.0, depth_max=20.0, depth_interval=0.05,
                      num_planes=128)
    cam = read_camera_file(p)
    assert cam.model == SPHERE
    np.testing.assert_allclose(cam.params[:3], [1.0, 512.0, 256.0])
    np.testing.assert_allclose(cam.depth_range, [1.0, 20.0])


def test_reference_format_camera_parses(tmp_path):
    """Exact reference format incl. the 0 0 0 1 row (ACMMP.cpp:161-166)."""
    text = """extrinsic
0.97 0.0 -0.24 1.5
0.0 1.0 0.0 -0.2
0.24 0.0 0.97 3.0
0.0 0.0 0.0 1.0

intrinsic
1164.66 0.0 960.0
0.0 1164.66 540.0
0.0 0.0 1.0

2.5 100.0 0.1 192
"""
    p = tmp_path / "ref.txt"
    p.write_text(text)
    cam = read_camera_file(p)
    np.testing.assert_allclose(cam.depth_range, [2.5, 100.0])
    np.testing.assert_allclose(np.asarray(cam.R)[0], [0.97, 0.0, -0.24])


def test_pair_file_roundtrip(tmp_path):
    neighbors = [
        [(1, 100.0), (2, 50.0)],
        [(0, 100.0), (2, 10.0), (3, 0.0)],  # zero score dropped on read
        [(0, 50.0)],
        [],
    ]
    p = tmp_path / "pair.txt"
    write_pair_file(p, neighbors)
    problems = read_pair_file(p)
    assert [pr.ref_image_id for pr in problems] == [0, 1, 2, 3]
    assert problems[0].src_image_ids == [1, 2]
    assert problems[1].src_image_ids == [0, 2]  # score<=0 dropped
    assert problems[3].src_image_ids == []


def test_scene_paths_layout(tmp_path):
    sp = ScenePaths(tmp_path)
    assert sp.image_file(3).name == "00000003.jpg"
    assert sp.camera_file(3).name == "00000003_cam.txt"
    assert sp.result_dir(7).name == "2333_00000007"
    assert sp.depth_file(7, geom=True).name == "depths_geom.dmb"
    assert sp.depth_file(7, geom=False).name == "depths.dmb"


def test_manifest_resume(tmp_path):
    from acmmp_spherical_tpu.io.scene import (
        mark_pass_complete, is_pass_complete, clear_manifest,
    )
    sp = ScenePaths(tmp_path)
    assert not is_pass_complete(sp, "photometric_s2", 0)
    mark_pass_complete(sp, "photometric_s2", 0)
    assert is_pass_complete(sp, "photometric_s2", 0)
    assert not is_pass_complete(sp, "photometric_s2", 1)
    clear_manifest(sp)
    assert not is_pass_complete(sp, "photometric_s2", 0)
