"""Tests for fusion and joint bilateral upsampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.config import FusionParams
from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
from acmmp_spherical_tpu.ops.fusion import fuse_all_views
from acmmp_spherical_tpu.ops.jbu import joint_bilateral_upsample
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


def test_fusion_gt_depths_lie_on_cube():
    scene = CubeRoom()
    W, H, n = 64, 48, 5
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=56.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    colors = np.repeat(images[..., None], 3, axis=-1)

    src_idx = np.array(
        [[j for j in range(n) if j != i] for i in range(n)], np.int32
    )
    pts, nrm, col = fuse_all_views(
        jnp.asarray(depths), jnp.asarray(normals), jnp.asarray(colors),
        stack_cameras(cams), src_idx, FusionParams(),
    )
    # most pixels should fuse (full GT consistency)
    assert len(pts) > 0.5 * n * W * H, len(pts)
    # fused points must lie on the cube surface
    dist_to_surface = np.abs(np.max(np.abs(pts), axis=1) - scene.half)
    assert np.percentile(dist_to_surface, 90) < 0.02
    # normals unit
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-3)
    # colors within range and matching the texture at the fused points
    tex = scene.texture(pts)
    assert np.median(np.abs(col[:, 0] - tex)) < 10.0


def test_fusion_rejects_inconsistent_depths():
    scene = CubeRoom()
    W, H, n = 48, 36, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=44.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    colors = np.repeat(images[..., None], 3, axis=-1)
    bad = depths.copy()
    # every view disagrees with every other (>1% pairwise depth ratio)
    for v in range(1, n):
        bad[v] *= 1.1 ** v
    src_idx = np.array([[j for j in range(n) if j != i] for i in range(n)], np.int32)
    pts, *_ = fuse_all_views(
        jnp.asarray(bad), jnp.asarray(normals), jnp.asarray(colors),
        stack_cameras(cams), src_idx, FusionParams(),
    )
    consistent_pts, *_ = fuse_all_views(
        jnp.asarray(depths), jnp.asarray(normals), jnp.asarray(colors),
        stack_cameras(cams), src_idx, FusionParams(),
    )
    assert len(pts) < 0.1 * len(consistent_pts)


def test_jbu_constant_field():
    coarse = jnp.full((10, 12), 5.0)
    guide = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (20, 24)).astype(np.float32))
    out = np.asarray(joint_bilateral_upsample(coarse, guide))
    np.testing.assert_allclose(out, 5.0, rtol=1e-5)
    assert out.shape == (20, 24)


def test_jbu_edge_preserving():
    # coarse depth step aligned with a guide intensity step
    h, w = 16, 16
    coarse = np.ones((h, w), np.float32)
    coarse[:, w // 2:] = 2.0
    guide = np.zeros((2 * h, 2 * w), np.float32)
    guide[:, w:] = 200.0
    out = np.asarray(joint_bilateral_upsample(jnp.asarray(coarse), jnp.asarray(guide)))
    # away from the edge, values are preserved
    np.testing.assert_allclose(out[:, : w - 4], 1.0, atol=1e-3)
    np.testing.assert_allclose(out[:, w + 4:], 2.0, atol=1e-3)
    # at the edge the guide keeps the step sharp: just right of the edge
    # should be close to 2.0, not the 1.5 a plain bilinear would give
    assert np.all(out[:, w + 1] > 1.9)


def test_jbu_vector_field():
    coarse = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8, 3)).astype(np.float32))
    guide = jnp.zeros((16, 16))
    out = joint_bilateral_upsample(coarse, guide)
    assert out.shape == (16, 16, 3)
