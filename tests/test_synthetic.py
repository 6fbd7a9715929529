"""Sanity tests for the analytic scene generator: multi-view photo-consistency
must hold exactly (up to texture band-limit) when reprojecting with GT depth."""

import numpy as np
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import PINHOLE, SPHERE
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_view,
)


@pytest.mark.parametrize("model", [PINHOLE, SPHERE])
def test_gt_depth_photo_consistency(model):
    scene = CubeRoom()
    W, H = (96, 72) if model == PINHOLE else (128, 64)
    cams = make_ring_of_cameras(3, model=model, width=W, height=H)
    imgs, depths, normals = [], [], []
    for c in cams:
        i, d, n = render_view(c, scene, W, H)
        imgs.append(i); depths.append(d); normals.append(n)

    ref, src = cams[0], cams[1]
    ys, xs = np.mgrid[8:H - 8, 8:W - 8].astype(np.float32)
    X = np.asarray(G.unproject_world(ref, xs, ys, jnp.asarray(depths[0][8:-8, 8:-8])))
    # the world point must be on the cube surface
    assert np.max(np.abs(X)) <= scene.half + 1e-3
    # its texture must match the rendered ref image exactly
    np.testing.assert_allclose(scene.texture(X), imgs[0][8:-8, 8:-8], atol=1e-3)

    # project into src and compare with src's texture at the projected point
    px, py, pd = G.project(src, jnp.asarray(X))
    px, py, pd = np.asarray(px), np.asarray(py), np.asarray(pd)
    # depth seen from src must equal src's GT depth at the projected pixel
    inb = (px >= 1) & (px < W - 1) & (py >= 1) & (py < H - 1) & (pd > 0)
    pxi = np.clip(np.round(px).astype(int), 0, W - 1)
    pyi = np.clip(np.round(py).astype(int), 0, H - 1)
    d_src = depths[1][pyi, pxi]
    rel = np.abs(pd - d_src) / d_src
    # GT consistency: away from cube edges most pixels agree to <2%
    assert np.median(rel[inb]) < 0.02


def test_normals_unit_and_inward():
    scene = CubeRoom()
    cams = make_ring_of_cameras(1)
    img, dep, nrm = render_view(cams[0], scene, 96, 72)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-6)
    assert img.shape == (72, 96)
    assert np.all(dep > 0)
    # looking +z from inside: central pixels hit the +z wall, normal -z
    np.testing.assert_allclose(nrm[36, 48], [0, 0, -1], atol=1e-6)


def test_depth_in_declared_range():
    scene = CubeRoom()
    for model in (PINHOLE, SPHERE):
        cams = make_ring_of_cameras(2, model=model)
        for c in cams:
            _, dep, _ = render_view(c, scene, 64, 48)
            dmin, dmax = np.asarray(c.depth_range)
            assert dep.min() >= dmin * 0.999
            assert dep.max() <= dmax * 1.001


def test_scene_write_roundtrip(tmp_path):
    from acmmp_spherical_tpu.utils.synthetic import render_scene, write_synthetic_scene_to_disk
    from acmmp_spherical_tpu.io.scene import read_pair_file, load_image_gray
    from acmmp_spherical_tpu.io import read_camera_file

    scene = CubeRoom()
    cams = make_ring_of_cameras(3, width=48, height=36)
    images, _, _ = render_scene(cams, scene, 48, 36)
    sp = write_synthetic_scene_to_disk(tmp_path / "scene", cams, images)
    problems = read_pair_file(sp.pair_file)
    assert len(problems) == 3
    assert problems[0].src_image_ids == [1, 2]
    img = load_image_gray(sp.image_file(0))
    assert img.shape == (36, 48)
    # jpeg quality 98: mean error small
    assert np.mean(np.abs(img - images[0])) < 4.0
    cam = read_camera_file(sp.camera_file(1))
    np.testing.assert_allclose(np.asarray(cam.R), np.asarray(cams[1].R), atol=1e-6)
