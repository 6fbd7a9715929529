"""Fused windowed-NCC kernel: interpret-mode equivalence with the exact path
on smooth plane fields (the evaluation class routed to the kernel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
from acmmp_spherical_tpu.ops.ncc import ref_tap_context, multiview_ncc
from acmmp_spherical_tpu.ops.sampling import grid_coords
from acmmp_spherical_tpu.ops.pallas.ncc_window import windowed_multiview_ncc
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


def test_windowed_ncc_matches_exact_on_smooth_field():
    scene = CubeRoom()
    W, H, n = 128, 48, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=90.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    images = jnp.asarray(images)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)
    ctx = ref_tap_context(images[0], ref_cam, params)

    exact = np.asarray(
        multiview_ncc(images[1:], src_cams, ref_cam, n_cam, w, ctx, params)
    )
    fast = np.asarray(
        windowed_multiview_ncc(images[1:], src_cams, ref_cam, n_cam, w, ctx,
                               params, interpret=True)
    )
    agree = np.abs(exact - fast) < 1e-3
    # smooth GT field: windows cover nearly everything
    assert agree.mean() > 0.95, agree.mean()
    # where costs differ (window-clipped taps near depth discontinuities), the
    # kernel must still be a valid cost in [0, cost_max]
    assert fast.min() >= 0.0 and fast.max() <= params.cost_max + 1e-6


def test_fast_pass_runs_and_recovers_depth_interpret():
    """Tiny full pass with fast_ncc on (interpret mode): quality parity."""
    import dataclasses

    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch

    scene = CubeRoom()
    W, H, n = 128, 32, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=100.0)
    images, depths, _ = render_scene(cams, scene, W, H)
    dmin, dmax = np.asarray(cams[0].depth_range)
    params = dataclasses.replace(
        PatchMatchParams(max_iterations=2).with_depth_range(dmin, dmax),
        fast_ncc=True,
    )
    inputs = PatchMatchInputs(
        ref_image=jnp.asarray(images[0]),
        src_images=jnp.asarray(images[1:]),
        ref_cam=cams[0],
        src_cams=stack_cameras(cams[1:]),
        src_valid=jnp.ones(n - 1, bool),
    )
    depth, *_ = run_patchmatch(inputs, params, jax.random.key(0))
    gt = depths[0]
    rel = np.abs(np.asarray(depth)[4:-4, 8:-8] - gt[4:-4, 8:-8]) / gt[4:-4, 8:-8]
    assert np.median(rel) < 0.05, np.median(rel)


def test_windowed_geom_cost_matches_exact():
    """Fused geom output (depth window riding the NCC kernel) equals the exact
    forward-backward reprojection cost wherever the window covers the lookup
    (reference ComputeGeomConsistencyCost, ACMMP.cu:646-671)."""
    from acmmp_spherical_tpu.ops.geom import geom_consistency_cost

    scene = CubeRoom()
    W, H, n = 128, 48, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=90.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    images = jnp.asarray(images)
    src_depths = jnp.asarray(depths[1:])
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)
    ctx = ref_tap_context(images[0], ref_cam, params)

    fast_cv, fast_gv = windowed_multiview_ncc(
        images[1:], src_cams, ref_cam, n_cam, w, ctx, params, src_depths,
        interpret=True,
    )
    exact_gv = np.asarray(geom_consistency_cost(
        src_depths, src_cams, ref_cam, n_cam, w, xs, ys, params
    ))
    fast_gv = np.asarray(fast_gv)
    agree = np.abs(exact_gv - fast_gv) < 1e-4
    assert agree.mean() > 0.95, agree.mean()
    assert fast_gv.min() >= 0.0 and fast_gv.max() <= params.geom_max_cost + 1e-6
    # the NCC output must be unchanged by the fused depth path
    plain = np.asarray(windowed_multiview_ncc(
        images[1:], src_cams, ref_cam, n_cam, w, ctx, params, interpret=True))
    np.testing.assert_allclose(np.asarray(fast_cv), plain, atol=1e-6)
