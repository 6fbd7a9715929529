"""Unit tests for the projective geometry core.

Strategy (SURVEY.md section 4): the geometry stack is pure and deterministic, so
we test round-trip identities (project o unproject == id for both camera models,
including longitude wrap) and hand-computed values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import (
    PINHOLE,
    SPHERE,
    make_camera,
    stack_cameras,
    camera_center,
)


def _rotation(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def pinhole_cam(width=64, height=48, f=50.0, R=None, t=None):
    K = np.array([[f, 0.0, width / 2], [0.0, f, height / 2], [0.0, 0.0, 1.0]])
    R = np.eye(3) if R is None else R
    t = np.zeros(3) if t is None else t
    return make_camera(R, t, model=PINHOLE, K=K, width=width, height=height,
                       depth_min=1.0, depth_max=10.0)


def sphere_cam(width=128, height=64, R=None, t=None):
    R = np.eye(3) if R is None else R
    t = np.zeros(3) if t is None else t
    return make_camera(
        R, t, model=SPHERE, sphere_params=[1.0, width / 2, height / 2],
        width=width, height=height, depth_min=1.0, depth_max=10.0,
    )


@pytest.mark.parametrize("make", [pinhole_cam, sphere_cam])
def test_project_unproject_roundtrip(make, rng):
    R = _rotation([0.3, 1.0, -0.2], 0.7)
    t = np.array([0.5, -0.2, 1.0])
    cam = make(R=R, t=t)
    W, H = np.asarray(cam.wh)
    x = jnp.asarray(rng.uniform(1, W - 2, (257,)), jnp.float32)
    y = jnp.asarray(rng.uniform(1, H - 2, (257,)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 8.0, (257,)), jnp.float32)

    X = G.unproject_world(cam, x, y, depth)
    x2, y2, d2 = G.project(cam, X)
    if cam.model == SPHERE:
        # longitude wrap: compare modulo W
        dx = (x2 - x + W / 2) % W - W / 2
        np.testing.assert_allclose(dx, 0.0, atol=5e-3)
    else:
        np.testing.assert_allclose(x2, x, rtol=0, atol=5e-3)
    np.testing.assert_allclose(y2, y, rtol=0, atol=5e-3)
    np.testing.assert_allclose(d2, depth, rtol=2e-5, atol=1e-4)


def test_sphere_longitude_wrap_exact():
    """A world point exactly behind the camera maps near the seam; wrapping the
    x coordinate modulo W must land on the same ray."""
    cam = sphere_cam()
    W = float(np.asarray(cam.wh)[0])
    # pixel at x=0 (lon = -pi): direction (0-ish, 0, -1)
    d = G.pixel_ray(cam, jnp.asarray(0.0), jnp.asarray(32.0))
    d_wrapped = G.pixel_ray(cam, jnp.asarray(W), jnp.asarray(32.0))
    np.testing.assert_allclose(d, d_wrapped, atol=1e-5)


def test_pinhole_ray_and_depth_convention():
    cam = pinhole_cam()
    # center pixel: ray (0,0,1); depth==z
    r = G.pixel_ray(cam, jnp.asarray(32.0), jnp.asarray(24.0))
    np.testing.assert_allclose(r, [0.0, 0.0, 1.0], atol=1e-6)
    X = G.unproject_world(cam, jnp.asarray(32.0), jnp.asarray(24.0), jnp.asarray(3.0))
    np.testing.assert_allclose(X, [0.0, 0.0, 3.0], atol=1e-6)


def test_sphere_ray_directions():
    """Hand-computed equirectangular directions (reference ACMMP.cu:127-133)."""
    cam = sphere_cam(width=360, height=180)
    # center pixel -> lon=0, lat=0 -> (0, 0, 1)
    np.testing.assert_allclose(
        G.pixel_ray(cam, jnp.asarray(180.0), jnp.asarray(90.0)), [0, 0, 1], atol=1e-6
    )
    # quarter to the right: lon=pi/2 -> (1, 0, 0)
    np.testing.assert_allclose(
        G.pixel_ray(cam, jnp.asarray(270.0), jnp.asarray(90.0)), [1, 0, 0], atol=1e-6
    )
    # top of image: lat=pi/2 -> (0, -1, 0)
    np.testing.assert_allclose(
        G.pixel_ray(cam, jnp.asarray(180.0), jnp.asarray(0.0)), [0, -1, 0], atol=1e-6
    )


@pytest.mark.parametrize("make", [pinhole_cam, sphere_cam])
def test_plane_depth_roundtrip(make, rng):
    """depth_from_plane o dist_to_origin == id along each pixel ray."""
    cam = make()
    W, H = np.asarray(cam.wh)
    x = jnp.asarray(rng.uniform(0, W - 1, (64,)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H - 1, (64,)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 8.0, (64,)), jnp.float32)
    n = G.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    # orient normals towards the camera so the plane is visible
    vd = G.view_direction(cam, x, y)
    n = jnp.where(jnp.sum(n * vd, axis=-1, keepdims=True) > 0, -n, n)
    w = G.dist_to_origin(cam, x, y, depth, n)
    d2 = G.depth_from_plane(cam, x, y, n, w)
    np.testing.assert_allclose(d2, depth, rtol=1e-4)


def test_plane_fronto_parallel_constant_depth():
    """A fronto-parallel plane (n = -z) gives depth == w at every pinhole pixel
    only at the center ray under the z convention -> for n=(0,0,-1), w = d*1
    gives depth d for ALL pixels (since n.r = -1 for every unnormalised ray)."""
    cam = pinhole_cam()
    n = jnp.asarray([0.0, 0.0, -1.0])
    xs = jnp.arange(0.0, 64.0)
    ys = jnp.full_like(xs, 10.0)
    w = G.dist_to_origin(cam, jnp.asarray(5.0), jnp.asarray(5.0), jnp.asarray(3.0),
                         n)
    d = G.depth_from_plane(cam, xs, ys, jnp.broadcast_to(n, (64, 3)),
                           jnp.full((64,), w))
    np.testing.assert_allclose(d, 3.0, rtol=1e-5)


def test_normal_frame_roundtrip(rng):
    R = _rotation([1.0, 0.4, 0.3], 1.1)
    cam = pinhole_cam(R=R, t=np.array([1.0, 2.0, 3.0]))
    n = G.normalize(jnp.asarray(rng.normal(size=(32, 3)), jnp.float32))
    n2 = G.normal_world_to_cam(cam, G.normal_cam_to_world(cam, n))
    np.testing.assert_allclose(n2, n, atol=1e-5)


def test_camera_center():
    R = _rotation([0.0, 1.0, 0.0], 0.5)
    t = np.array([0.3, -1.0, 2.0])
    cam = pinhole_cam(R=R, t=t)
    C = np.asarray(camera_center(cam))
    np.testing.assert_allclose(R @ C + t, 0.0, atol=1e-6)


def test_homography_matches_explicit_reprojection(rng):
    """For pinhole pairs, the plane homography must agree with the explicit
    plane -> world -> project path used by the cost kernel."""
    ref = pinhole_cam()
    src = pinhole_cam(R=_rotation([0, 1, 0], 0.1), t=np.array([0.3, 0.0, 0.0]))
    x = jnp.asarray(rng.uniform(5, 59, (16,)), jnp.float32)
    y = jnp.asarray(rng.uniform(5, 43, (16,)), jnp.float32)
    n = jnp.asarray([0.1, -0.05, -1.0])
    n = G.normalize(n)
    w = G.dist_to_origin(ref, jnp.asarray(32.0), jnp.asarray(24.0), jnp.asarray(4.0), n)

    H = G.plane_homography(ref, src, n, w)
    hx, hy = G.apply_homography(H, x, y)

    d = G.depth_from_plane(ref, x, y, jnp.broadcast_to(n, (16, 3)), jnp.full((16,), w))
    X = G.unproject_world(ref, x, y, d)
    px, py, _ = G.project(src, X)
    # f32 inv(K) vs the explicit unproject/project path: agree to ~0.03 px.
    np.testing.assert_allclose(hx, px, rtol=0, atol=5e-2)
    np.testing.assert_allclose(hy, py, rtol=0, atol=5e-2)


def test_stack_and_index_cameras():
    cams = stack_cameras([pinhole_cam(), pinhole_cam(t=np.ones(3))])
    assert cams.R.shape == (2, 3, 3)
    from acmmp_spherical_tpu.core.camera import camera_index
    c1 = camera_index(cams, 1)
    np.testing.assert_allclose(c1.t, 1.0)


def test_geometry_jits():
    cam = sphere_cam()
    f = jax.jit(lambda x, y, d: G.project(cam, G.unproject_world(cam, x, y, d)))
    x2, y2, d2 = f(jnp.asarray([10.0]), jnp.asarray([20.0]), jnp.asarray([2.0]))
    assert np.isfinite(np.asarray(x2)).all()
