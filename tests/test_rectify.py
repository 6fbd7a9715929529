"""Epipolar rectification geometry: row alignment, affine disparity, warps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import PINHOLE, camera_center, stack_cameras
from acmmp_spherical_tpu.ops import rectify as RZ
from acmmp_spherical_tpu.ops.sampling import grid_coords
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


@pytest.fixture(scope="module")
def ring():
    W, H, n = 128, 96, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=90.0)
    return cams, W, H


def _pair(cams):
    ref = cams[0]
    srcs = stack_cameras(cams[1:])
    rect_hw = RZ.rect_shape(int(np.asarray(ref.height)), int(np.asarray(ref.width)))
    pr = RZ.build_pair_rect(ref, srcs, rect_hw)
    return ref, srcs, rect_hw, pr


def test_rows_align_for_corresponding_points(ring):
    """The defining property: a 3D point projects to the SAME row in the
    rectified ref and rectified src frames."""
    cams, W, H = ring
    ref, srcs, rect_hw, pr = _pair(cams)
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(2.0, 6.0, 200)  # in front of the ring

    for s in range(pr.H0.shape[0]):
        src = jax.tree.map(lambda a: a[s], srcs)
        # original projections
        px0, py0, d0 = (np.asarray(a) for a in G.project(ref, jnp.asarray(X)))
        px1, py1, d1 = (np.asarray(a) for a in G.project(src, jnp.asarray(X)))
        vis = (d0 > 0.1) & (d1 > 0.1)
        # rectified coords via the pixel homographies
        H0 = pr.H0[s]
        xr0, yr0, z0 = (np.asarray(a) for a in RZ.rect_coords(H0, px0, py0))
        H1 = np.asarray(
            jnp.linalg.inv(pr.H1inv[s])
        )
        xr1, yr1, z1 = (np.asarray(a) for a in RZ.rect_coords(jnp.asarray(H1), px1, py1))
        vis &= (z0 > 0) & (z1 > 0)
        assert vis.sum() > 50
        np.testing.assert_allclose(yr0[vis], yr1[vis], atol=2e-2)
        # disparity is positive (src to the +x side by construction)
        disp = xr0[vis] - xr1[vis]
        # rect x-axis points from ref to src: z>0 points have f*B/z > 0
        assert np.all(disp > -1e-3)


def test_affine_disparity_matches_projection(ring):
    """disp_coeffs reproduces the exact rectified correspondence of a plane."""
    cams, W, H = ring
    ref, srcs, rect_hw, pr = _pair(cams)
    rng = np.random.default_rng(1)

    for s in range(2):
        src = jax.tree.map(lambda a: a[s], srcs)
        pr_i = jax.tree.map(lambda a: a[s], pr)
        # random plane in ref-cam frame, facing the camera
        n = np.array([0.2, -0.1, -1.0], np.float32)
        n /= np.linalg.norm(n)
        w = np.float32(3.0)  # plane: n.X + w = 0 -> z ~ 3 at center
        # sample rectified pixels, get plane depth along rect ray
        xs = rng.uniform(50, 120, 64).astype(np.float32)
        ys = rng.uniform(30, 90, 64).astype(np.float32)
        a, b, c = RZ.disp_coeffs(pr_i, jnp.asarray(n), jnp.asarray(w))
        f, cx, cy = (np.asarray(pr_i.K)[i] for i in range(3))
        disp = np.asarray(a) * (xs - cx) + np.asarray(b) * (ys - cy) + np.asarray(c)

        # ground truth: intersect the rect ray with the plane, project to src
        n_r = np.asarray(pr_i.R_rr) @ n
        ray = np.stack([(xs - cx) / f, (ys - cy) / f, np.ones_like(xs)], -1)
        z = -w / (ray @ n_r)
        X_rect = ray * z[:, None]
        # rect-src frame = rect-ref frame shifted by baseline along x
        X_rect_src = X_rect - np.array([np.asarray(pr_i.baseline), 0, 0])
        x_src = f * X_rect_src[:, 0] / X_rect_src[:, 2] + cx
        y_src = f * X_rect_src[:, 1] / X_rect_src[:, 2] + cy
        keep = z > 0.5
        np.testing.assert_allclose(xs[keep] - disp[keep], x_src[keep],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(ys[keep], y_src[keep], atol=1e-4)


def test_warp_roundtrip_and_sentinel(ring):
    """Warped ref image matches direct sampling; src warp writes sentinels
    outside the original footprint."""
    cams, W, H = ring
    ref, srcs, rect_hw, pr = _pair(cams)
    scene = CubeRoom()
    images, _, _ = render_scene(cams, scene, W, H)
    img = jnp.asarray(images[0])

    s = 0
    rw = RZ.warp_to_rect(img, pr.H0inv[s], ref.width, ref.height, rect_hw,
                         sentinel=True)
    hr, wr = rect_hw
    assert rw.shape == (hr + 2 * RZ.PAD_Y, wr + 2 * RZ.PAD_X)
    rw = np.asarray(rw)
    # pick original pixels, check their rectified positions carry the value
    xs, ys = grid_coords(H, W)
    xr, yr, _ = RZ.rect_coords(pr.H0[s], xs, ys)
    xr = np.asarray(xr); yr = np.asarray(yr)
    interior = (xr > 2) & (xr < wr - 3) & (yr > 2) & (yr < hr - 3)
    assert interior.mean() > 0.9  # the frame fits the warped image
    # warped-image value at the rectified position ~= original pixel (the warp
    # resamples, so compare through bilinear interpolation tolerance)
    iy = np.clip(np.round(yr).astype(int), 0, hr - 1)
    ix = np.clip(np.round(xr).astype(int), 0, wr - 1)
    vals = rw[iy + RZ.PAD_Y, ix + RZ.PAD_X]
    img_np = np.asarray(img)
    diff = np.abs(vals - img_np)[interior]
    # texture is smooth; nearest-pixel roundtrip error stays small
    assert np.median(diff) < 12.0, np.median(diff)
    # sentinels present outside the footprint (the padded border)
    assert (rw[0] < RZ.SENTINEL_THRESH).all()


def test_host_rectifiable_gate(ring):
    cams, W, H = ring
    ref, srcs, rect_hw, pr = _pair(cams)
    assert RZ.host_rectifiable(ref, srcs, rect_hw)

    # degenerate: src at the same centre -> not rectifiable
    import dataclasses

    bad = stack_cameras([cams[0], cams[1]])  # contains the zero-baseline pair
    assert not RZ.host_rectifiable(ref, bad, rect_hw)
    # forward motion: src directly along the ref optical axis -> epipole in
    # image -> rejected
    fwd = dataclasses.replace(
        cams[1],
        R=cams[0].R,
        t=cams[0].t - jnp.asarray(cams[0].R) @ jnp.asarray([0.0, 0.0, 0.5]),
    )
    assert not RZ.host_rectifiable(ref, stack_cameras([fwd]), rect_hw)
