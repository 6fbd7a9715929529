"""Pole-rotated spherical fast path: behavioral gates (interpret mode).

Mirrors tests/test_rect_ncc.py for SPHERE problems: GT planes must score
near-zero, wrong planes clearly higher, rankings must agree with the exact
sphere path, and a full PatchMatch pass on the spherical golden must match
the exact path's accuracy.  Reference sphere branches: ACMMP.cu:425-486.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import SPHERE, stack_cameras
from acmmp_spherical_tpu.ops.ncc import multiview_ncc, ref_tap_context
from acmmp_spherical_tpu.ops.sampling import grid_coords
from acmmp_spherical_tpu.ops.sphere_rect import (
    build_sphere_rect_context, sphere_batched_ncc, sphere_rectifiable,
)
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


@pytest.fixture(scope="module")
def setup():
    scene = CubeRoom()
    W, H, n = 256, 128, 4
    cams = make_ring_of_cameras(n, model=SPHERE, width=W, height=H)
    images, depths, normals = render_scene(cams, scene, W, H)
    images = jnp.asarray(images)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    assert sphere_rectifiable(ref_cam, src_cams)
    ctx = build_sphere_rect_context(images[0], images[1:], ref_cam, src_cams,
                                    (dmin, dmax))
    return images, depths, ref_cam, src_cams, params, n_cam, w, ctx, (H, W)


def test_sphere_ncc_scores_gt_low_and_wrong_high(setup):
    images, depths, ref_cam, src_cams, params, n_cam, w, ctx, (H, W) = setup
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    cost = np.asarray(sphere_batched_ncc(ctx, normals, ws, params,
                                         interpret=True))
    assert cost.shape == (2, 3, H, W)
    good = cost[0]
    badf = cost[1]
    valid = good < params.cost_max - 1e-3
    # every pair masks its own polar caps, so per-view coverage is partial
    # but must still be substantial
    assert valid.mean() > 0.5, valid.mean()
    assert np.median(good[valid]) < 0.15, np.median(good[valid])
    assert np.mean(badf) > 2.0 * np.mean(good) and np.mean(badf) > 0.15


def test_sphere_ncc_agrees_with_exact_ranking(setup):
    images, depths, ref_cam, src_cams, params, n_cam, w, ctx, (H, W) = setup
    ctx_ref = ref_tap_context(images[0], ref_cam, params)
    w2 = w * 1.2
    exact0 = np.asarray(multiview_ncc(images[1:], src_cams, ref_cam, n_cam, w,
                                      ctx_ref, params))
    exact1 = np.asarray(multiview_ncc(images[1:], src_cams, ref_cam, n_cam,
                                      w2, ctx_ref, params))
    cost = np.asarray(sphere_batched_ncc(
        ctx, jnp.stack([n_cam, n_cam]), jnp.stack([w, w2]), params,
        interpret=True))
    r0, r1 = cost[0], cost[1]
    e0, e1 = exact0, exact1
    ok = (r0 < params.cost_max - 1e-3) & (r1 < params.cost_max - 1e-3) \
        & (e0 < params.cost_max - 1e-3) & (e1 < params.cost_max - 1e-3)
    margin = np.abs(e0 - e1) > 0.05
    sel = ok & margin
    assert sel.mean() > 0.15, sel.mean()
    agree = ((r0 < r1) == (e0 < e1))[sel]
    assert agree.mean() > 0.85, agree.mean()
    assert np.median(np.abs(r0 - e0)[ok]) < 0.12


@pytest.mark.slow
@pytest.mark.parametrize("rect_init", [False, True])
def test_sphere_full_pass_quality(setup, rect_init):
    """Full PatchMatch pass with the spherical fast kernel (interpret mode)
    reaches the exact path's accuracy on the spherical golden."""
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch

    images, depths, ref_cam, src_cams, params, n_cam, w, ctx, (H, W) = setup
    dr = jnp.asarray(np.asarray(ref_cam.depth_range), jnp.float32)
    inputs = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(3, bool), depth_range=dr,
    )
    if rect_init:
        from acmmp_spherical_tpu.ops.sphere_rect import sphere_init_window

        iwin = sphere_init_window(ref_cam, src_cams)
        assert iwin > 0
    else:
        iwin = 0
    rparams = dataclasses.replace(params, rect_ncc=True, rect_init=iwin > 0,
                                  rect_init_win=iwin or 384)
    d, _, cost, _ = run_patchmatch(inputs, rparams, jax.random.key(0))
    d = np.asarray(d)
    gt = depths[0]
    rel = np.abs(d - gt) / gt
    # equirect frames wrap in x; exclude only the polar rows of the ORIGINAL
    # frame (sphere-camera ray density degenerates there for any method)
    band = np.s_[H // 8: -H // 8, :]
    assert np.median(rel[band]) < 0.02, np.median(rel[band])


def test_sphere_geom_cost(setup):
    """The fused meridian disparity-mismatch geom term: near zero for GT
    planes + GT source depths, clamped high for a wrong plane."""
    images, depths, ref_cam, src_cams, params, n_cam, w, ctx, (H, W) = setup
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    ctx_g = build_sphere_rect_context(images[0], images[1:], ref_cam,
                                      src_cams, (dmin, dmax),
                                      src_depths=jnp.asarray(depths[1:]))
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.5])
    cv, gv = sphere_batched_ncc(ctx_g, normals, ws, params, interpret=True,
                                with_geom=True)
    gv = np.asarray(gv)
    ok = gv[0] < params.geom_max_cost - 1e-3
    assert ok.mean() > 0.4, ok.mean()
    assert np.median(gv[0][ok]) < 0.7, np.median(gv[0][ok])
    # the wrong plane's mismatch must agree with the exact forward-backward
    # reprojection error (disparities are only a few px at this equirect
    # resolution, so the clamp is not reached -- compare magnitudes instead)
    from acmmp_spherical_tpu.ops.geom import geom_consistency_cost
    from acmmp_spherical_tpu.ops.ncc import ref_tap_context as _rtc

    ctx_ref = _rtc(images[0], ref_cam, params)
    g_exact = np.asarray(geom_consistency_cost(
        jnp.asarray(depths[1:]), src_cams, ref_cam, n_cam, w * 1.5,
        ctx_ref.xs, ctx_ref.ys, params))
    m_fused = np.median(gv[1][ok])
    m_exact = np.median(g_exact[ok])
    assert m_fused > 3.0 * np.median(gv[0][ok]), (m_fused,
                                                  np.median(gv[0][ok]))
    assert abs(m_fused - m_exact) < 0.5 + 0.3 * m_exact, (m_fused, m_exact)


@pytest.mark.slow
def test_sphere_epipole_and_seam_quality(setup):
    """Quality specifically in the regions the pole-rotated approximation
    treats specially (VERDICT r2 weak #9): each pair's epipole neighbourhoods
    (= the rotated poles, masked per pair by LAT_CAP -- other views must heal
    them) and the longitude seam columns.  The reference evaluates epipole
    regions exactly (ACMMP.cu:425-486) so a large hole here would be a real
    capability gap, not noise."""
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch

    images, depths, ref_cam, src_cams, params, n_cam, w, ctx, (H, W) = setup
    dr = jnp.asarray(np.asarray(ref_cam.depth_range), jnp.float32)
    inputs = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(3, bool), depth_range=dr,
    )
    rparams = dataclasses.replace(params, rect_ncc=True)
    d, _, cost, _ = run_patchmatch(inputs, rparams, jax.random.key(3))
    rel = np.abs(np.asarray(d) - depths[0]) / depths[0]

    # epipole pixels of every pair in the ORIGINAL equirect frame
    from acmmp_spherical_tpu.core.camera import camera_center

    C0 = np.asarray(camera_center(ref_cam))
    R0 = np.asarray(ref_cam.R)
    cx, cy = float(ref_cam.params[1]), float(ref_cam.params[2])
    ys_g, xs_g = np.mgrid[0:H, 0:W]
    epi_mask = np.zeros((H, W), bool)
    for s in range(3):
        Cs = -np.asarray(src_cams.R[s]).T @ np.asarray(src_cams.t[s])
        for sign in (1.0, -1.0):
            b = sign * R0 @ (Cs - C0)
            b = b / np.linalg.norm(b)
            lat = -np.arcsin(np.clip(b[1], -1, 1))
            lon = np.arctan2(b[0], b[2])
            ex = lon / (2 * np.pi) * W + cx
            ey = -lat / np.pi * H + cy
            dx = np.minimum(np.abs(xs_g - ex), W - np.abs(xs_g - ex))
            epi_mask |= (dx ** 2 + (ys_g - ey) ** 2) < (H / 8.0) ** 2
    # keep epipole discs away from the original polar rows (degenerate for
    # any method)
    band = np.zeros((H, W), bool)
    band[H // 8: -H // 8] = True
    sel = epi_mask & band
    assert sel.mean() > 0.01, "epipole discs missed the test band"
    assert np.median(rel[sel]) < 0.05, np.median(rel[sel])

    # longitude seam columns (wrap correctness end-to-end)
    seam = np.zeros((H, W), bool)
    seam[:, : W // 32] = True
    seam[:, -W // 32:] = True
    seam &= band
    assert np.median(rel[seam]) < 0.03, np.median(rel[seam])
